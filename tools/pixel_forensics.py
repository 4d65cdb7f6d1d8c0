"""Per-pixel f64 ground truth for the PSNR-gate scene.

For chosen pixels, re-derives the exact blend in numpy float64 straight
from the scene parameters (no jax in the hot math), with the same
semantics as gs2pc.ops.blend (power<=0, alpha=min(.99, op*exp(power)),
skip alpha<1/255, stop when T*(1-alpha)<1e-4 BEFORE compositing the
trigger, white background), gaussians depth-sorted ascending with
stable index tie-break.  Compares against the saved tile image
(/tmp/diff_tile_img.npz) and dense-oracle image
(/tmp/ablate_oracle_1000000.npz) to attribute the at-scale PSNR loss.

Usage: python tools/pixel_forensics.py  (CPU, ~1 min)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from gs2pc.utils.platform import honour_platform_env

honour_platform_env()

from bench import make_cameras, make_scene  # noqa: E402

W, H = 1280, 720
N = int(os.environ.get("ABLATE_GAUSS", 1_000_000))


def main():
    scene = make_scene(N, seed=2)
    cameras, wp, hp = make_cameras(1, W, H)
    cam = cameras.at(0)
    viewm = np.asarray(cam.viewmatrix, np.float64)
    projm = np.asarray(cam.projmatrix, np.float64)
    tanfovx = float(cam.tanfovx)
    tanfovy = float(cam.tanfovy)
    fx, fy = float(cam.focal_x), float(cam.focal_y)

    xyz = np.asarray(scene.xyz, np.float64)
    M3 = np.asarray(scene.covariance_factors(), np.float64)
    op = np.asarray(scene.opacities, np.float64)
    col = np.asarray(scene.colours, np.float64)

    # ---- preprocess (f64 mirror of gs2pc/ops/projection.py) ---- #
    Rv, tv = viewm[:3, :3], viewm[:3, 3]
    p_view = xyz @ Rv.T + tv
    depth = p_view[:, 2]
    ph = xyz @ projm[:3, :3].T + projm[:3, 3]
    pw = xyz @ projm[3, :3].T + projm[3, 3]
    inv_w = 1.0 / (pw + 1e-7)
    pix = np.stack(
        [((ph[:, 0] * inv_w + 1.0) * W - 1.0) * 0.5,
         ((ph[:, 1] * inv_w + 1.0) * H - 1.0) * 0.5], axis=1)

    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz = np.where(np.abs(depth) < 1e-6, 1e-6, depth)
    tx = np.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = np.clip(p_view[:, 1] / tz, -limy, limy) * tz
    T0 = np.einsum("ij,pjk->pik", Rv, M3)
    inv_z = 1.0 / tz
    row0 = (fx * inv_z)[:, None] * T0[:, 0, :] - (fx * tx * inv_z**2)[:, None] * T0[:, 2, :]
    row1 = (fy * inv_z)[:, None] * T0[:, 1, :] - (fy * ty * inv_z**2)[:, None] * T0[:, 2, :]
    cov_a = np.sum(row0 * row0, -1) + 0.3
    cov_b = np.sum(row0 * row1, -1)
    cov_c = np.sum(row1 * row1, -1) + 0.3
    det = cov_a * cov_c - cov_b * cov_b
    ok = (depth > 0.2) & (det > 0)
    det_s = np.where(ok, det, 1.0)
    conA, conB, conC = cov_c / det_s, -cov_b / det_s, cov_a / det_s

    mid = 0.5 * (cov_a + cov_c)
    lam = mid + np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(np.sqrt(9.0 * np.maximum(lam, 0.0)))
    ok &= op >= 1.0 / 255.0

    order = np.argsort(np.where(ok, depth, np.inf).astype(np.float32),
                       kind="stable")

    tile_img = np.load("/tmp/diff_tile_img.npz")["image"]
    oracle = np.load("/tmp/ablate_oracle_1000000.npz")["image"]
    d = np.abs(tile_img[:H, :W] - oracle[:H, :W]).max(axis=2)
    worst = np.argsort(-d.ravel())[:12]

    def blend_pixel(px_x, px_y, rect_cull=True, dtype=np.float64):
        """Full blend at one pixel; returns (rgb, n_blended, contribs)."""
        tx_t, ty_t = px_x // 16, px_y // 16
        Tt = dtype(1.0)
        rgb = np.zeros(3, dtype)
        n_bl = 0
        log = []
        for g in order:
            if not ok[g]:
                break  # inf depths sorted to the end
            if rect_cull:
                rmin_x = min(max(int(np.floor((pix[g, 0] - radius[g]) / 16)), 0), W // 16)
                rmin_y = min(max(int(np.floor((pix[g, 1] - radius[g]) / 16)), 0), (H + 15) // 16)
                rmax_x = min(max(int(np.floor((pix[g, 0] + radius[g] + 15) / 16)), 0), W // 16)
                rmax_y = min(max(int(np.floor((pix[g, 1] + radius[g] + 15) / 16)), 0), (H + 15) // 16)
                if not (rmin_x <= tx_t < rmax_x and rmin_y <= ty_t < rmax_y):
                    continue
            dx = dtype(px_x) - dtype(pix[g, 0])
            dy = dtype(px_y) - dtype(pix[g, 1])
            power = dtype(-0.5) * (dtype(conA[g]) * dx * dx + dtype(conC[g]) * dy * dy) - dtype(conB[g]) * dx * dy
            if power > 0:
                continue
            alpha = min(dtype(0.99), dtype(op[g]) * np.exp(power))
            if alpha < dtype(1.0 / 255.0):
                continue
            if Tt * (dtype(1.0) - alpha) < dtype(1e-4):
                break
            w = alpha * Tt
            rgb += w * col[g].astype(dtype)
            Tt *= dtype(1.0) - alpha
            n_bl += 1
            log.append((int(g), float(depth[g]), float(alpha), float(w),
                        col[g].tolist()))
        rgb += Tt  # white background
        return rgb, n_bl, log

    for o in worst:
        py, px = divmod(int(o), W)
        truth, n_bl, log = blend_pixel(px, py)
        t_px = tile_img[py, px]
        o_px = oracle[py, px]
        et = np.abs(t_px - truth).max()
        eo = np.abs(o_px - truth).max()
        side = "TILE wrong" if et > 10 * eo else (
            "ORACLE wrong" if eo > 10 * et else "both off")
        print(f"px({py:3d},{px:4d}) truth={np.round(truth, 4)} "
              f"tile={np.round(t_px, 4)} oracle={np.round(o_px, 4)} "
              f"|tile-truth|={et:.4f} |oracle-truth|={eo:.4f} "
              f"n_blend={n_bl}  -> {side}", flush=True)
        if et > 0.05 and eo > 0.05:
            for rec in log[:8]:
                print("   ", rec)


if __name__ == "__main__":
    main()

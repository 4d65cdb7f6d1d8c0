"""Independent numpy splat-render oracle.

Written DIRECTLY from the reference CUDA kernel's equations —
preprocessCUDA / computeCov3D / computeCov2D (forward.cu:153-271,
:76-150) and renderCUDA (forward.cu:303-497) plus ndc2Pix/getRect
(auxiliary.h) — sharing ZERO code with gs2pc.ops (no imports from the
package at all).  It exists to break the self-referential oracle loop:
the production tile renderer and the in-package dense oracle share
gs2pc.ops.blend / gs2pc.ops.projection, so a common-mode bug in the EWA
chain or the alpha semantics would be invisible to their mutual parity
tests.  This file re-derives everything from the published math.

Conventions consumed (plain data, matching the camera loader):
  viewmatrix: (4, 4) world->view, column-vector (p_view = V @ [p, 1]).
  projmatrix: (4, 4) full projection (GL projection @ view).

Deliberately O(P * npx) and slow — for tiny test scenes only.
"""

from __future__ import annotations

import numpy as np

_NEAR_Z = 0.2  # frustum near cull (auxiliary.h:167)
_H_VAR = 0.3  # 2D covariance low-pass dilation (forward.cu:219)
_ALPHA_MAX = 0.99
_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4
_FLOAT_MAX = np.finfo(np.float32).max


def _quat_to_rot(q):
    """(P, 4) wxyz (normalised) -> (P, 3, 3) rotation matrices.

    Row-major form of the matrix in computeCov3D (forward.cu:130-135)."""
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((q.shape[0], 3, 3), np.float64)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - r * z)
    R[:, 0, 2] = 2 * (x * z + r * y)
    R[:, 1, 0] = 2 * (x * y + r * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - r * x)
    R[:, 2, 0] = 2 * (x * z - r * y)
    R[:, 2, 1] = 2 * (y * z + r * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def _cov3d(log_scales, quats):
    """Sigma = R S S^T R^T (computeCov3D, forward.cu:115-149)."""
    s = np.exp(np.asarray(log_scales, np.float64))
    R = _quat_to_rot(np.asarray(quats, np.float64))
    M = R * s[:, None, :]  # R @ diag(s)
    return M @ np.transpose(M, (0, 2, 1))  # (P, 3, 3)


def _ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def render_oracle(
    xyz,
    log_scales,
    quats,
    opacities,
    colours,
    viewmatrix,
    projmatrix,
    tanfovx,
    tanfovy,
    focal_x,
    focal_y,
    width,
    height,
    mask=None,  # (H, W) 0/1; 0 = pixel excluded entirely
    white_bkgd=True,
    antialiasing=False,
    tile=16,
    calc_surface_distance=True,
    run_chunk=None,
):
    """Render one camera exactly per the reference kernel equations.

    ``run_chunk``: when set, the surface-distance pass reproduces the
    reference's block-level break (forward.cu:369-371: once every pixel
    in a tile is done, the ENTIRE batch loop — surface pass included —
    exits), at ``run_chunk``-pair batch granularity instead of the CUDA
    BLOCK_SIZE of 256: a pair only enters a tile's surface min if its
    rank in the tile's depth-ordered run lands in a batch streamed
    before that break.  When None (legacy mode, what the dense renderer
    pins), the surface min covers every rect pair.

    Returns a dict: image (H, W, 3), depth (H, W), invdepth (H, W),
    contrib (P,), best_pix (P,), best_colour (P, 3), surf_dist (P,),
    radius (P,).
    """
    xyz = np.asarray(xyz, np.float64)
    P = xyz.shape[0]
    V = np.asarray(viewmatrix, np.float64)
    PM = np.asarray(projmatrix, np.float64)
    op = np.asarray(opacities, np.float64).copy()
    cols = np.asarray(colours, np.float64)

    # ---- preprocess (forward.cu:153-271) ---------------------------- #
    p_view = xyz @ V[:3, :3].T + V[:3, 3]
    depth = p_view[:, 2]
    valid = depth > _NEAR_Z

    hom = xyz @ PM[:3, :3].T + PM[:3, 3]
    w = xyz @ PM[3, :3].T + PM[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    ndc = hom * inv_w[:, None]
    px = _ndc2pix(ndc[:, 0], width)
    py = _ndc2pix(ndc[:, 1], height)

    Sigma = _cov3d(log_scales, quats)

    # computeCov2D (forward.cu:76-110): cov = J W Sigma W^T J^T.
    tz = np.where(np.abs(depth) < 1e-12, 1e-12, depth)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tx = np.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = np.clip(p_view[:, 1] / tz, -limy, limy) * tz
    J = np.zeros((P, 2, 3), np.float64)
    J[:, 0, 0] = focal_x / tz
    J[:, 0, 2] = -(focal_x * tx) / (tz * tz)
    J[:, 1, 1] = focal_y / tz
    J[:, 1, 2] = -(focal_y * ty) / (tz * tz)
    JW = J @ V[None, :3, :3]
    cov2d = JW @ Sigma @ np.transpose(JW, (0, 2, 1))  # (P, 2, 2)

    a_raw = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c_raw = cov2d[:, 1, 1]
    det_raw = a_raw * c_raw - b * b
    a = a_raw + _H_VAR
    c = c_raw + _H_VAR
    det = a * c - b * b
    if antialiasing:
        # forward.cu:217-225: rescale opacity by the AA convolution factor.
        scaling = np.sqrt(np.maximum(2.5e-5, det_raw / det))
        op = op * scaling
    valid &= det > 0.0
    det_safe = np.where(det > 0, det, 1.0)
    conic_a = c / det_safe
    conic_b = -b / det_safe
    conic_c = a / det_safe

    # Radius = ceil(3 sqrt(max eigenvalue)) (forward.cu:236-240).
    mid = 0.5 * (a + c)
    disc = np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(3.0 * np.sqrt(np.maximum(mid + disc, 0.0)))

    # getRect (auxiliary.h): tile rect, exclusive max.
    grid_w = (width + tile - 1) // tile
    grid_h = (height + tile - 1) // tile
    rminx = np.clip(((px - radius) / tile).astype(np.int64), 0, grid_w)
    rminy = np.clip(((py - radius) / tile).astype(np.int64), 0, grid_h)
    rmaxx = np.clip(((px + radius + tile - 1) / tile).astype(np.int64), 0, grid_w)
    rmaxy = np.clip(((py + radius + tile - 1) / tile).astype(np.int64), 0, grid_h)
    valid &= (rmaxx - rminx) * (rmaxy - rminy) > 0

    # ---- sort: front-to-back by depth, ties by Gaussian id ----------- #
    # (the CUDA [tile|depth-bits] radix sort is stable over the id-ordered
    # duplication, so equal depths keep id order within a tile)
    order = np.lexsort((np.arange(P), depth))
    order = order[valid[order]]

    # ---- per-pixel sequential blend (renderCUDA, forward.cu:303-497) - #
    ys, xs = np.mgrid[0:height, 0:width]
    pixf_x = xs.astype(np.float64).ravel()
    pixf_y = ys.astype(np.float64).ravel()
    tile_x = (xs // tile).ravel()
    tile_y = (ys // tile).ravel()
    npx = width * height
    if mask is not None:
        live0 = np.asarray(mask).reshape(npx) != 0
    else:
        live0 = np.ones(npx, bool)

    T = np.ones(npx, np.float64)
    done = ~live0
    C = np.zeros((npx, 3), np.float64)
    exp_depth = np.zeros(npx, np.float64)
    exp_invdepth = np.zeros(npx, np.float64)
    contrib = np.zeros(P, np.float64)
    best_pix = np.full(P, -1, np.int64)

    # Chunk-break bookkeeping (run_chunk mode): cnt[t] = pairs emitted
    # into tile t's run so far (= the rank the NEXT pair gets);
    # trig_rank[p] = rank within p's tile run of the pair whose test_T
    # drop marked p done (-1 = never).
    cnt = np.zeros((grid_h, grid_w), np.int64)
    trig_rank = np.full(npx, -1, np.int64)

    for g in order:
        in_rect = (
            (tile_x >= rminx[g]) & (tile_x < rmaxx[g])
            & (tile_y >= rminy[g]) & (tile_y < rmaxy[g])
        )
        dx = px[g] - pixf_x
        dy = py[g] - pixf_y
        power = (
            -0.5 * (conic_a[g] * dx * dx + conic_c[g] * dy * dy)
            - conic_b[g] * dx * dy
        )
        alpha = np.minimum(_ALPHA_MAX, op[g] * np.exp(power))
        ok = in_rect & ~done & (power <= 0.0) & (alpha >= _ALPHA_MIN) & live0
        test_T = T * (1.0 - alpha)
        trigger = ok & (test_T < _T_EPS)
        done = done | trigger  # triggering Gaussian is NOT composited
        if run_chunk is not None:
            rank_px = cnt[tile_y, tile_x]  # g's rank in each pixel's tile
            trig_rank = np.where(
                trigger & (trig_rank < 0), rank_px, trig_rank
            )
            cnt[rminy[g]:rmaxy[g], rminx[g]:rmaxx[g]] += 1
        use = ok & ~trigger
        w_g = np.where(use, alpha * T, 0.0)
        C += w_g[:, None] * cols[g][None, :]
        exp_depth += w_g * depth[g]
        exp_invdepth += w_g / depth[g]
        T = np.where(use, test_T, T)
        if w_g.size and w_g.max() > 0.0:
            contrib[g] = w_g.max()
            best_pix[g] = int(np.argmax(w_g))

    bg = 1.0 if white_bkgd else 0.0
    img = np.where(live0[:, None], C + T[:, None] * bg, 0.0)
    out_depth = np.where(live0, exp_depth, 0.0)
    out_invdepth = np.where(live0, exp_invdepth, 0.0)

    # Rendered colour at the winning pixel (__init__.py:128-133 role).
    best_colour = np.zeros((P, 3), np.float64)
    has = best_pix >= 0
    best_colour[has] = img[np.maximum(best_pix[has], 0)]

    # ---- surface distance (forward.cu:460-477) ---------------------- #
    surf = np.full(P, _FLOAT_MAX, np.float64)
    if calc_surface_distance and run_chunk is None:
        for g in order:
            in_rect = (
                (tile_x >= rminx[g]) & (tile_x < rmaxx[g])
                & (tile_y >= rminy[g]) & (tile_y < rmaxy[g])
                & live0
            )
            if in_rect.any():
                surf[g] = np.abs(depth[g] - exp_depth[in_rect]).min()
    elif calc_surface_distance:
        # Chunk-break mode: tile t streams batches only while some live
        # pixel is not done at the batch start (forward.cu:369-371).  A
        # pixel whose trigger landed at rank k keeps batches streaming
        # through batch k // run_chunk; a pixel that never triggers keeps
        # the tile streaming to the end of its run.
        need = np.where(trig_rank >= 0, trig_rank // run_chunk, -1)
        run_len_px = cnt[tile_y, tile_x]
        never = (trig_rank < 0) & live0
        need = np.where(
            never, (run_len_px + run_chunk - 1) // run_chunk - 1, need
        )
        need = np.where(live0, need, -1)
        n_streamed = np.zeros((grid_h, grid_w), np.int64)
        np.maximum.at(n_streamed, (tile_y, tile_x), need + 1)
        rank_cap = n_streamed * run_chunk  # pairs at rank >= cap excluded

        cnt2 = np.zeros((grid_h, grid_w), np.int64)
        for g in order:
            elig = cnt2 < rank_cap  # g's rank per tile, pre-increment
            sel = (
                (tile_x >= rminx[g]) & (tile_x < rmaxx[g])
                & (tile_y >= rminy[g]) & (tile_y < rmaxy[g])
                & live0 & elig[tile_y, tile_x]
            )
            if sel.any():
                surf[g] = np.abs(depth[g] - exp_depth[sel]).min()
            cnt2[rminy[g]:rmaxy[g], rminx[g]:rmaxx[g]] += 1

    return {
        "image": img.reshape(height, width, 3).astype(np.float32),
        "depth": out_depth.reshape(height, width).astype(np.float32),
        "invdepth": out_invdepth.reshape(height, width).astype(np.float32),
        "contrib": contrib.astype(np.float32),
        "best_pix": best_pix,
        "best_colour": best_colour.astype(np.float32),
        "surf_dist": surf.astype(np.float32),
        "radius": radius,
        "valid": valid,
    }


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)

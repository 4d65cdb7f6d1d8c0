"""End-to-end benchmark at the NORTH-STAR definition (BASELINE.json):

  3M-Gaussian scene -> 10M-point coloured cloud ON DISK, 45 cameras @
  1280x720 (colour_quality "high"), surface distances ON, pixel masks
  exercised, visibility-prioritised budgeting — the MipNeRF360-class
  workload the <30 s / one-chip target is defined against (reference
  workflow: README.md:104-109, camera_skip_rate 4 over a full capture).

The timed path is the REAL pipeline, exactly what `gs2pc.cli.main` runs
(reference main() wall-clock, gauss_to_pc.py:712-786): load the scene
.ply from disk, load transforms.json + PNG masks, render sweep, colour
assignment + cull chain, PSD validation, point sampling, host compaction
and the chunked PLY write.  Two conversions run; the second (steady
state, compile-cached) is the headline and the first is reported as
``t_cold_s``.

An at-scale QUALITY GATE renders one 1280x720 camera of a 1M-Gaussian
capture scene with the production tile renderer (auto pair budget,
run_cap 4096 — the regime where run-cap tails are dropped) against the
exact dense oracle, split into short band dispatches; the bench FAILS
(exit 1, after printing its record) below 40 dB PSNR.

The reference repo publishes no quantitative numbers (BASELINE.md), so
``vs_baseline`` is measured against the north-star target rate derived
from BASELINE.json: 10M points in 30 s  =>  333,333 points/s.

The bench is BUDGET-SAFE and FAIL-SOFT (VERDICT r04 #1/#5): it prints
the JSON record after every completed stage (read the LAST line — the
most complete one; never zero lines after the first conversion), and it
enforces an internal wall-clock deadline so an external kill is never
needed.  The PSNR gate's dense-oracle image/accumulators persist in the
gs2pc cache keyed by scene config; partial band coverage resumes on the
next run.

Env knobs: GS2PC_BENCH_GAUSSIANS, GS2PC_BENCH_POINTS, GS2PC_BENCH_CAMERAS,
GS2PC_BENCH_WIDTH, GS2PC_BENCH_HEIGHT, GS2PC_BENCH_PALLAS (auto|1|0),
GS2PC_BENCH_COMPARE (1 = also time the other blend's sweep, default 0),
GS2PC_BENCH_SURFACE, GS2PC_BENCH_MASKS, GS2PC_BENCH_PSNR (default 1),
GS2PC_BENCH_PSNR_GAUSS (default 1,000,000), GS2PC_BENCH_DIR (capture
scratch dir; default a TemporaryDirectory), GS2PC_BENCH_DEADLINE_S
(internal wall-clock budget, default 420).
"""

import json
import math
import os
import sys
import tempfile
import time

import numpy as np

NORTH_STAR_POINTS_PER_S = 10_000_000 / 30.0
PSNR_GATE_DB = 40.0
# At-scale accumulator gate (VERDICT r03 #4): max relative error of the
# per-Gaussian max-contribution / min-surface-distance accumulators (tile
# vs banded dense oracle) that the cull chain consumes.
ACC_RELERR_GATE = 0.05
# f32 max: the renderer's "never on any surface" sentinel (ops/blend.py).
FLOAT_MAX_BENCH = float(np.finfo(np.float32).max)

# Per-(pair, pixel) blend FLOP estimate for the MFU figure: power (6),
# exp (~8), alpha/test (4), colour/depth/invdepth accumulation (10),
# transmittance update (2) ~= 30 flops.
FLOPS_PER_PAIR_PIXEL = 30.0
TPX = 256  # pixels per 16x16 tile
# Per-chip dense bf16 MXU headline peaks; the blend is f32 VPU work, so
# the MFU figure is conservative by construction — it answers "what
# fraction of the chip's paper peak does the pipeline extract".
PEAK_FLOPS_BY_KIND = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12,  # v6e / Trillium
    "v6e": 918e12,
}
PEAK_FLOPS_DEFAULT = 459e12


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for name, peak in PEAK_FLOPS_BY_KIND.items():
        if name in kind:
            return peak
    return PEAK_FLOPS_DEFAULT


class HostSceneArrays:
    """Host-numpy scene planes (pre-upload).

    The bench builds its synthetic capture ON THE HOST and writes it to
    disk; uploading the planes to the device only to fetch them back for
    the capture write round-trips ~170 MB over the (possibly tunnelled,
    highly variable) device link — measured eating 10+ minutes of the
    round-4-style driver budget on a degraded tunnel.  ``to_device()``
    builds the device ``Gaussians`` only for the stages that actually
    compute on it (PSNR gate / blend compare)."""

    def __init__(self, xyz, log_scales, rots, colours, opacities):
        self.xyz = xyz
        self.log_scales = log_scales
        self.rots = rots
        self.colours = colours
        self.opacities = opacities

    def to_device(self):
        from gs2pc.models.gaussians import Gaussians

        # Fused single-transfer upload: the tunnelled transport charges
        # ~0.4 s fixed overhead PER transfer (see Gaussians.create_fused).
        return Gaussians.create_fused(
            self.xyz, self.log_scales, self.rots, self.colours,
            self.opacities,
        )


def make_ball_scene_arrays(n, seed=0):
    """Legacy bench scene: a dense Gaussian ball every camera fully sees.

    Pathological by capture standards — every camera's frustum contains
    ALL n Gaussians and per-tile depth runs saturate the per-tile cap —
    so it stresses the per-pair machinery ~3x harder than any real
    MipNeRF360-style capture.  Kept selectable (GS2PC_BENCH_SCENE=ball)
    as a worst-case stress config."""
    r = np.random.default_rng(seed)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    xyz = r.normal(size=(n, 3)).astype(np.float32)
    xyz *= (1.0 + 2.0 * r.uniform(size=(n, 1)).astype(np.float32) ** 4)
    log_scales = r.uniform(-6.5, -4.0, (n, 3)).astype(np.float32)
    big = r.uniform(size=n) < 0.1
    log_scales[big] = r.uniform(-4.0, -2.5, (big.sum(), 3)).astype(np.float32)
    return HostSceneArrays(
        xyz, log_scales, quats,
        r.uniform(0, 1, (n, 3)).astype(np.float32),
        r.uniform(0.2, 1.0, n).astype(np.float32),
    )


def make_scene(n, seed=0, kind=None):
    """Device ``Gaussians`` bench scene (tools/gate stages)."""
    return make_scene_arrays(n, seed=seed, kind=kind).to_device()


def make_scene_arrays(n, seed=0, kind=None):
    """Default bench scene: capture statistics, not a worst-case ball.

    Models a trained MipNeRF360-style export the way the reference is
    actually run (README.md:104-109): splats concentrated on surfaces
    (ground annulus + central object clusters), a low-opacity filler
    shell, and a sparse far dome of large background splats.  Cameras
    orbiting the centre see a FRACTION of the scene per frustum and
    per-tile depth runs stay in the hundreds-to-low-thousands — matching
    real captures, where a 720p view of a 3M-splat scene expands to
    single-digit-millions of splat-tile pairs, not tens of millions.
    GS2PC_BENCH_SCENE=ball selects the legacy stress scene."""
    kind = kind or os.environ.get("GS2PC_BENCH_SCENE", "capture")
    if kind == "ball":
        return make_ball_scene_arrays(n, seed)

    r = np.random.default_rng(seed)
    n_ground = int(n * 0.42)
    n_obj = int(n * 0.34)
    n_fill = int(n * 0.239)
    n_sky = n - n_ground - n_obj - n_fill  # ~0.1%

    # Ground: a disc of near-flat splats inside the camera ring, denser
    # towards the centre, scale growing with distance (trained exports
    # size splats to local observation density).
    rad = 0.4 + 3.8 * r.uniform(size=n_ground) ** 1.4
    ang = r.uniform(0, 2 * np.pi, n_ground)
    g_xyz = np.stack(
        [rad * np.cos(ang), -0.7 + 0.04 * r.normal(size=n_ground),
         rad * np.sin(ang)], axis=1,
    )
    g_s = r.uniform(-4.7, -3.9, n_ground) + 0.12 * rad
    g_scales = np.stack(
        [g_s, r.uniform(-5.4, -4.6, n_ground), g_s + r.uniform(-0.2, 0.2, n_ground)],
        axis=1,
    )

    # Objects: detail splats in clusters around the capture centre.
    n_clusters = 6
    centres = np.stack(
        [r.uniform(-1.2, 1.2, n_clusters),
         r.uniform(-0.4, 0.5, n_clusters),
         r.uniform(-1.2, 1.2, n_clusters)], axis=1,
    )
    which = r.integers(0, n_clusters, n_obj)
    # Trained exports reconstruct SURFACES: splats sit on object shells,
    # so a ray crosses a handful of near-opaque layers and the blend's
    # early stop fires after tens of pairs — volumetric blobs would give
    # every central tile a thousands-deep depth column no real capture
    # has.
    o_dir = r.normal(size=(n_obj, 3))
    o_dir /= np.linalg.norm(o_dir, axis=1, keepdims=True)
    o_rad = r.uniform(0.22, 0.45, n_obj) * (1.0 + 0.06 * r.normal(size=n_obj))
    o_xyz = centres[which] + o_dir * o_rad[:, None]
    o_scales = r.uniform(-5.0, -3.8, (n_obj, 3))

    # Filler: sparse low-opacity mid-scale splats in an outer shell
    # (beyond the camera ring, so they stay at moderate depth).
    f_rad = 9.0 + 5.0 * r.uniform(size=n_fill)
    f_dir = r.normal(size=(n_fill, 3))
    f_dir /= np.linalg.norm(f_dir, axis=1, keepdims=True)
    f_xyz = f_dir * f_rad[:, None]
    f_xyz[:, 1] = np.abs(f_xyz[:, 1]) * 0.5 - 0.5
    f_scales = r.uniform(-3.2, -2.2, (n_fill, 3))

    # Sky/background: few, huge, far — the 50+-tile splats every real
    # capture contains.
    s_dir = r.normal(size=(n_sky, 3))
    s_dir /= np.linalg.norm(s_dir, axis=1, keepdims=True)
    s_dir[:, 1] = np.abs(s_dir[:, 1])
    s_xyz = s_dir * 28.0
    s_scales = r.uniform(0.2, 1.1, (n_sky, 3))

    xyz = np.concatenate([g_xyz, o_xyz, f_xyz, s_xyz]).astype(np.float32)
    log_scales = np.concatenate(
        [g_scales, o_scales, f_scales, s_scales]
    ).astype(np.float32)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = np.concatenate(
        [r.uniform(0.6, 1.0, n_ground), r.uniform(0.5, 1.0, n_obj),
         r.uniform(0.05, 0.4, n_fill), r.uniform(0.5, 0.9, n_sky)]
    ).astype(np.float32)
    colours = r.uniform(0, 1, (n, 3)).astype(np.float32)
    return HostSceneArrays(xyz, log_scales, quats, colours, opac)


def make_poses(n_cams, width, height, focal_scale=0.9):
    """Orbit poses + intrinsics dicts (NeRF c2w convention)."""
    transforms, intr = {}, {}
    focal = focal_scale * width
    for i in range(n_cams):
        angle = i * (2 * np.pi / n_cams)
        c = np.array([5.0 * np.sin(angle), 1.5, -5.0 * np.cos(angle)])
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, c
        c2w[:, 1:3] = -c2w[:, 1:3]
        transforms[f"c{i:02d}"] = c2w.tolist()
        intr[f"c{i:02d}"] = (width, height, focal, focal)
    return transforms, intr


def vignette_mask(width, height):
    """Elliptical vignette (~86% live pixels), like a real masked capture."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    e = (
        ((xs - width / 2) / (width * 0.55)) ** 2
        + ((ys - height / 2) / (height * 0.55)) ** 2
    )
    return (e <= 1.0).astype(np.uint8)


def make_cameras(n_cams, width, height, focal_scale=0.9, with_masks=False):
    from gs2pc.camera import build_camera_batch

    transforms, intr = make_poses(n_cams, width, height, focal_scale)
    masks = None
    if with_masks:
        m = vignette_mask(width, height)
        masks = {name: m for name in transforms}
    return build_camera_batch(transforms, intr, masks=masks)


# ------------------------------------------------------------------ #
# Capture materialisation (the on-disk inputs the CLI pipeline reads)
# ------------------------------------------------------------------ #

def write_scene_ply(path, scene):
    """Compact RGB-layout 3DGS .ply (loader: gs2pc/io/ply.py:214-224).

    Fields: xyz, red/green/blue (f32 in [0,1] — autodetect leaves them),
    opacity (logit; the loader sigmoids), scale_0..2 (log), rot_0..3."""
    xyz = np.asarray(scene.xyz, np.float32)
    n = xyz.shape[0]
    cols = np.asarray(scene.colours, np.float32)
    op = np.clip(np.asarray(scene.opacities, np.float32), 1e-6, 1 - 1e-6)
    logit = np.log(op / (1.0 - op)).astype(np.float32)
    props = (
        ["x", "y", "z", "red", "green", "blue", "opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    rows = np.concatenate(
        [
            xyz, cols, logit[:, None],
            np.asarray(scene.log_scales, np.float32),
            np.asarray(scene.rots, np.float32),
        ],
        axis=1,
    ).astype("<f4")
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        fh.write(rows.tobytes())


def write_capture(root, scene, transforms, intr, with_masks):
    """Materialise scene.ply + transforms.json (+ PNG masks) on disk."""
    ply = os.path.join(root, "scene.ply")
    write_scene_ply(ply, scene)

    frames = []
    for name in sorted(transforms):
        w, h, fx, fy = intr[name]
        frames.append(
            {
                "file_path": f"images/{name}.png",
                "transform_matrix": transforms[name],
                "w": int(w), "h": int(h),
                "fl_x": float(fx), "fl_y": float(fy),
            }
        )
    tj = os.path.join(root, "transforms.json")
    with open(tj, "w") as fh:
        json.dump({"frames": frames}, fh)

    mask_dir = None
    if with_masks:
        from PIL import Image

        mask_dir = os.path.join(root, "masks")
        os.makedirs(mask_dir, exist_ok=True)
        w, h = intr[next(iter(intr))][:2]
        m = (vignette_mask(int(w), int(h)) * 255).astype(np.uint8)
        img = Image.fromarray(m, mode="L")
        for name in transforms:
            img.save(os.path.join(mask_dir, f"{name}.png"))
    return ply, tj, mask_dir


# ------------------------------------------------------------------ #
# Timed paths
# ------------------------------------------------------------------ #

def run_e2e(ply, tj, mask_dir, settings, out_path):
    """ONE full conversion, scene-on-disk to cloud-on-disk — the exact
    work of gs2pc.cli.main (reference main(), gauss_to_pc.py:712-786)."""
    from gs2pc import pipeline
    from gs2pc.io.ply import save_point_cloud_ply
    from gs2pc.utils import log

    log.reset_phases()
    t0 = time.perf_counter()
    total_pc, _ = pipeline.convert_3dgs_to_pc(ply, tj, mask_dir, settings)
    with log.phase("ply_write"):
        # Streaming writer: the device->host point transfer overlaps the
        # disk write (it now lands in t_io, no longer in t_sample).
        save_point_cloud_ply(total_pc, out_path, chunk_size=10**6, quiet=True)
    t_total = time.perf_counter() - t0
    ph = dict(log.PHASE_SECONDS)
    return {
        "t_total": t_total,
        "t_load": ph.get("load_gaussians", 0.0),
        "t_parse": ph.get("scene_parse", 0.0),
        "t_upload": ph.get("scene_upload", 0.0),
        # budget_probe is nested inside render_sweep; report the sweep
        # proper and the probe separately (VERDICT r03 weak #3: the
        # per-camera sweep rate was inflated by the probe's hidden cost).
        "t_probe": ph.get("budget_probe", 0.0),
        "t_sweep": ph.get("render_sweep", 0.0) - ph.get("budget_probe", 0.0),
        "t_sample": ph.get("point_sampling", 0.0),
        "t_io": ph.get("ply_write", 0.0),
        "n_points": int(total_pc.total),
        "diag": list(pipeline.LAST_SWEEP_DIAG or [0.0, 0.0, 0.0, 0.0]),
    }


def time_sweep_only(scene, cameras, cfg, use_pallas, calc_surface):
    """Sweep wall-clock for one blend implementation (variant compare)."""
    import jax.numpy as jnp

    from gs2pc.parallel.sweep import render_sweep_chunked
    from gs2pc.utils.platform import fetch_sync

    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )

    def sweep():
        return render_sweep_chunked(
            arrays, cameras, cfg,
            calc_surface_distance=calc_surface, use_pallas=use_pallas,
        )

    fetch_sync(sweep())  # compile + warm
    t0 = time.perf_counter()
    fetch_sync(sweep())
    return time.perf_counter() - t0


def _oracle_cache_path(n_gauss, width, height):
    """Persistent path for the dense-oracle image/accumulators, or None.

    The oracle is a PURE function of (scene kind, n_gauss, seed=2,
    width, height) — recomputing it every bench run is what blew the
    driver's budget in round 4 (VERDICT r04 #1).  It persists next to
    the XLA compile / budget-probe caches; the v-salt invalidates old
    entries if the oracle maths ever change."""
    try:
        from gs2pc.utils.cache import resolve_cache_dir

        root = resolve_cache_dir()
        if root is None:
            return None
        os.makedirs(root, exist_ok=True)
        kind = os.environ.get("GS2PC_BENCH_SCENE", "capture")
        return os.path.join(
            root, f"bench_oracle_{kind}_{n_gauss}_{width}x{height}_v1.npz"
        )
    except Exception:
        return None


def psnr_vs_oracle(n_gauss, width, height, use_pallas, time_left=None):
    """At-scale quality gate: production tile renderer vs the exact dense
    oracle on one camera of a capture-statistics scene at production
    capacities (auto pair budget, run_cap 4096, compact rgb24 pair
    tables — the CLI defaults).  The oracle runs in short band
    dispatches (block_range) so no single device program approaches the
    watchdog, is cached on disk across runs (pure function of its
    inputs), and band rendering stops when ``time_left()`` runs out —
    partial coverage gates the covered rows and persists the finished
    bands so the NEXT run completes the oracle instead of restarting."""
    import jax
    import jax.numpy as jnp

    from gs2pc.ops.dense_render import render_dense
    from gs2pc.ops.rasterize import TileConfig, auto_pair_budget, render_tile_camera

    scene = make_scene(n_gauss, seed=2)
    cameras, wp, hp = make_cameras(1, width, height)
    cam = cameras.at(0)
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )
    cfg = TileConfig(
        width_pad=wp, height_pad=hp, run_cap=4096, run_chunk=128,
        tile_batch=128, compact=True,  # the production CLI default
    )
    cfg = cfg._replace(
        pair_budget=auto_pair_budget(arrays, cameras, cfg)
    )

    # The tile render below is one compile + run that CANNOT be
    # interrupted (a cold compile runs minutes): refuse to start it
    # without headroom, so the worst-case deadline overrun stays one
    # band/compile, well inside the external driver-kill margin.
    if time_left is not None and time_left() < 60.0:
        return {"psnr": None, "psnr_coverage": 0.0, "complete": False}

    tile_out = jax.jit(
        lambda a: render_tile_camera(
            *a, cam, cfg, use_pallas=use_pallas,
            calc_surface_distance=True,
        )
    )(arrays)
    tile_img = np.asarray(tile_out.image)
    tile_contrib = np.asarray(tile_out.contrib)
    tile_surf = np.asarray(tile_out.surf_dist)

    # Oracle bands: whole pixel rows per block so bands assemble exactly.
    # Surface distances ON so the per-Gaussian accumulators the cull
    # chain consumes (max contribution, min surface distance,
    # __init__.py:142-158) are gated at scale too — VERDICT r03 #4.
    rows_per_band = max(1, (1 << 16) // wp)
    blk = rows_per_band * wp
    n_blk = -(-(hp * wp) // blk)
    bands_per_call = 1

    cache_path = _oracle_cache_path(n_gauss, width, height)
    oracle_rows = np.zeros((n_blk * rows_per_band, wp, 3), np.float32)
    o_contrib = np.zeros(tile_contrib.shape, np.float32)
    o_surf = np.full(tile_surf.shape, FLOAT_MAX_BENCH, np.float32)
    n_done = 0
    if cache_path and os.path.exists(cache_path):
        try:
            with np.load(cache_path) as z:
                if (
                    z["image"].shape == oracle_rows.shape
                    and z["contrib"].shape == o_contrib.shape
                ):
                    oracle_rows = z["image"]
                    o_contrib = z["contrib"]
                    o_surf = z["surf"]
                    n_done = int(z["n_done"])
        except Exception:
            n_done = 0  # unreadable cache: recompute

    dirty = False
    if n_done < n_blk:
        @jax.jit
        def band(lo):
            out = render_dense(
                *arrays, cam, wp, hp,
                chunk=256, pixel_chunk=blk,
                calc_surface_distance=True, rect_cull=True,
                block_range=(lo, bands_per_call),
            )
            return out.image, out.contrib, out.surf_dist

        t_band = None
        for b in range(n_done, n_blk):
            if time_left is not None:
                # Stop while there is still time to persist + report;
                # the first band's time (incl. compile) calibrates the
                # per-band cost estimate.
                need = (t_band or 60.0) + 15.0
                if time_left() < need:
                    break
            t0 = time.perf_counter()
            img_b, c_b, s_b = band(b)
            oracle_rows[b * rows_per_band:(b + 1) * rows_per_band] = (
                np.asarray(img_b)
            )
            o_contrib = np.maximum(o_contrib, np.asarray(c_b))
            o_surf = np.minimum(o_surf, np.asarray(s_b))
            dt = time.perf_counter() - t0
            t_band = dt if t_band is None else 0.5 * (t_band + dt)
            n_done = b + 1
            dirty = True

    if dirty and cache_path:
        try:
            tmp = f"{cache_path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:  # file object: no .npz appending
                np.savez(
                    f, image=oracle_rows, contrib=o_contrib, surf=o_surf,
                    n_done=n_done,
                )
            os.replace(tmp, cache_path)
        except Exception:
            pass  # cache write failure never fails the gate

    complete = n_done >= n_blk
    h, w = int(height), int(width)
    rows_covered = min(n_done * rows_per_band, h)
    oracle = oracle_rows[:hp]
    if rows_covered <= 0:
        return {"psnr": None, "psnr_coverage": 0.0, "complete": False}
    diff = (
        tile_img[:rows_covered, :w] - oracle[:rows_covered, :w]
    )
    mse = float(np.mean(diff.astype(np.float64) ** 2))
    psnr = 99.0 if mse <= 0.0 else float(10.0 * math.log10(1.0 / mse))
    out = {
        "psnr": psnr,
        "psnr_coverage": round(rows_covered / h, 4),
        "complete": complete,
    }
    if not complete:
        # Partial-oracle accumulators are lower bounds (max over fewer
        # pixels) / upper bounds (min over fewer pixels): gating the tile
        # values against them would false-fail, so the accumulator gates
        # only run at full coverage.
        return out

    # Accumulator gates.  The tile renderer sees a SUBSET of the oracle's
    # pairs (circle-tile cull inside the rect, run-cap tails, the
    # reference's early-exit break in the surface pass), so equality is
    # not the invariant — these are:
    #
    #  * contrib: near-equal in the zero-live-drop regime the production
    #    config runs in (max relative error; dead Gaussians floored).
    #  * surface distance: a min over FEWER pairs can only be LARGER, so
    #    any tile value materially BELOW the oracle's min is corruption
    #    (wrong depth pairing, bad decode).  Tolerance scales with the
    #    Gaussian's view depth: dropped sub-1/255-T pairs shift the
    #    expected-depth map the distances are measured against by up to
    #    ~0.4% of depth.
    #  * finiteness: a tile-finite / oracle-infinite Gaussian is
    #    impossible (subset) — any occurrence is a bug.
    c_rel = float(np.max(
        np.abs(tile_contrib - o_contrib) / np.maximum(o_contrib, 0.05)
    )) if tile_contrib.size else 0.0
    fin_t = tile_surf < FLOAT_MAX_BENCH * 0.5
    fin_o = o_surf < FLOAT_MAX_BENCH * 0.5
    vm = np.asarray(cam.viewmatrix, np.float64)
    means_np = np.asarray(arrays[0], np.float64)
    depth_g = (means_np @ vm[2, :3]) + vm[2, 3]
    tol = 1e-3 + 0.01 * np.abs(depth_g).astype(np.float32)
    both = fin_t & fin_o
    s_under = float(np.max(
        np.where(both, o_surf - tile_surf - tol, -np.inf)
    )) if both.any() else 0.0
    bad_finite = float(np.mean(fin_t & ~fin_o))
    out.update({
        "acc_contrib_relerr": c_rel,
        "acc_surf_underrun": max(s_under, 0.0),
        "acc_surf_bad_finite_frac": bad_finite,
    })
    return out


def main():
    """Budget-safe, fail-soft bench (VERDICT r04 #1/#5).

    Emits the record as a JSON line after EVERY completed stage (the
    driver reads the tail, so the most complete line always wins and a
    later-stage overrun can never forfeit earlier results), and enforces
    an INTERNAL wall-clock deadline (GS2PC_BENCH_DEADLINE_S, default
    480 s): each stage is skipped when the remaining budget cannot fit
    it, and the bench always exits cleanly under its own power — an
    external kill (which can strand the TPU lease) is never needed."""
    t_start = time.monotonic()
    # 420 s leaves ~3 min of margin below a typical external ~10 min
    # kill for the one uninterruptible step (a cold compile) that may
    # already be in flight when the deadline trips.
    deadline_s = float(os.environ.get("GS2PC_BENCH_DEADLINE_S", 420))

    def time_left():
        return deadline_s - (time.monotonic() - t_start)

    from gs2pc.utils.platform import honour_platform_env

    honour_platform_env()  # let JAX_PLATFORMS=cpu smoke tests actually run on CPU

    import jax

    from gs2pc.cli import enable_compilation_cache
    from gs2pc.ops.rasterize import TileConfig
    from gs2pc.utils import log
    from gs2pc.utils.config import GaussPointCloudSettings, RenderConfig
    from gs2pc.utils.platform import is_tpu_backend

    enable_compilation_cache()

    n_gauss = int(os.environ.get("GS2PC_BENCH_GAUSSIANS", 3_000_000))
    n_points = int(os.environ.get("GS2PC_BENCH_POINTS", 10_000_000))
    n_cams = int(os.environ.get("GS2PC_BENCH_CAMERAS", 45))
    width = int(os.environ.get("GS2PC_BENCH_WIDTH", 1280))
    height = int(os.environ.get("GS2PC_BENCH_HEIGHT", 720))
    calc_surface = os.environ.get("GS2PC_BENCH_SURFACE", "1") == "1"
    with_masks = os.environ.get("GS2PC_BENCH_MASKS", "1") == "1"
    pallas_env = os.environ.get("GS2PC_BENCH_PALLAS", "auto")
    compare = os.environ.get("GS2PC_BENCH_COMPARE", "0") == "1"
    want_psnr = os.environ.get("GS2PC_BENCH_PSNR", "1") == "1"
    n_psnr = int(os.environ.get("GS2PC_BENCH_PSNR_GAUSS", 1_000_000))
    bench_dir = os.environ.get("GS2PC_BENCH_DIR")

    on_tpu = is_tpu_backend()
    if pallas_env == "auto":
        primary_pallas = on_tpu
    else:
        primary_pallas = pallas_env == "1"
    pallas_mode = "on" if primary_pallas else "off"

    dev = jax.devices()[0]
    # HOST scene arrays: the capture write must not round-trip the scene
    # over the device link (see HostSceneArrays).
    scene = make_scene_arrays(n_gauss)
    transforms, intr = make_poses(n_cams, width, height)

    tmp = None
    if bench_dir is None:
        tmp = tempfile.TemporaryDirectory(prefix="gs2pc_bench_")
        bench_dir = tmp.name
    os.makedirs(bench_dir, exist_ok=True)
    ply, tj, mask_dir = write_capture(
        bench_dir, scene, transforms, intr, with_masks
    )
    out_path = os.path.join(bench_dir, "cloud.ply")

    # Surface distances exercised end-to-end with a huge keep-std: the
    # surface cull then coincides with the visibility cull (unrendered
    # Gaussians carry FLOAT_MAX), keeping the workload the north-star one
    # while the surface pass still runs every camera.
    settings = GaussPointCloudSettings(
        num_points=n_points,
        surface_distance_std=1e6 if calc_surface else None,
        colour_resolution=width,
        quiet=True,
        render=RenderConfig(use_pallas=pallas_mode),
    )

    record = {
        "metric": (
            f"e2e_disk_to_disk_points_per_second[{n_gauss}g,{n_cams}cam@"
            f"{width}x{height},{n_points}pts,surface={int(calc_surface)},"
            f"masks={int(with_masks)}]"
        ),
        "unit": "points/s",
        "blend": "pallas" if primary_pallas else "xla",
        "scene": os.environ.get("GS2PC_BENCH_SCENE", "capture"),
        "device": f"{getattr(dev, 'platform', '?')}:{getattr(dev, 'device_kind', '?')}",
    }

    def emit():
        record["bench_wall_s"] = round(time.monotonic() - t_start, 1)
        print(json.dumps(record), flush=True)

    def fill_from(run, prefix_cold=None):
        from gs2pc import pipeline as _pipeline
        from gs2pc.io.ply import LAST_WRITE_INFO

        pps = run["n_points"] / run["t_total"]
        nd = run["diag"]
        # MFU estimate: blend FLOPs = pairs_blended (whole sweep) x 256
        # pixels/tile x ~30 flops, over the sweep wall-clock.
        blend_flops = nd[0] * TPX * FLOPS_PER_PAIR_PIXEL
        mfu = blend_flops / max(run["t_sweep"], 1e-9) / peak_flops_for(dev)
        record.update({
            "value": round(pps, 1),
            "vs_baseline": round(pps / NORTH_STAR_POINTS_PER_S, 3),
            "t_total_s": round(run["t_total"], 3),
            "t_load_s": round(run["t_load"], 3),
            "t_parse_s": round(run["t_parse"], 3),
            "t_upload_s": round(run["t_upload"], 3),
            "t_probe_s": round(run["t_probe"], 3),
            "t_sweep_s": round(run["t_sweep"], 3),
            "t_sample_s": round(run["t_sample"], 3),
            "t_io_s": round(run["t_io"], 3),
            "t_other_s": round(
                run["t_total"] - run["t_load"] - run["t_probe"]
                - run["t_sweep"] - run["t_sample"] - run["t_io"], 3,
            ),
            "points": run["n_points"],
            "pairs_blended": nd[0],
            "window_dropped": nd[1],
            "runcap_dropped": nd[2],
            "runcap_dropped_live": nd[3] if len(nd) > 3 else nd[2],
            "blend_mfu_est": round(mfu, 5),
            "sampler": _pipeline.LAST_SAMPLER,
            "sampler_reason": _pipeline.LAST_SAMPLER_REASON,
            "writer": LAST_WRITE_INFO.get("writer"),
            "write_sink": LAST_WRITE_INFO.get("sink"),
        })
        if prefix_cold is not None:
            record["t_cold_s"] = round(prefix_cold["t_total"], 3)

    log.set_quiet(True)

    # Stage 1: cold conversion (includes compiles).  Its record goes out
    # immediately — the round-4 failure mode (580 s with ZERO output)
    # cannot recur past this point.
    cold = run_e2e(ply, tj, mask_dir, settings, out_path)
    fill_from(cold)
    record["t_cold_s"] = round(cold["t_total"], 3)
    record["steady"] = False
    emit()

    # Stage 2: steady-state conversion (compile-cached) — the headline.
    if time_left() > 0.35 * cold["t_total"] + 20.0:
        steady = run_e2e(ply, tj, mask_dir, settings, out_path)
        fill_from(steady, prefix_cold=cold)
        record["steady"] = True
        emit()

    # Stage 3: at-scale PSNR + accumulator gate (oracle disk-cached;
    # band rendering stops under the deadline and partial coverage is
    # reported + persisted for the next run).  The entry threshold
    # covers the stage's uninterruptible pre-band work (scene build +
    # budget probe + tile-render compile); psnr_vs_oracle re-checks the
    # budget before its own compile-heavy steps.
    psnr_ok = True
    if want_psnr and time_left() > 100.0:
        gate = psnr_vs_oracle(
            n_psnr, width, height, primary_pallas, time_left=time_left
        )
        if gate.get("psnr") is not None:
            record["psnr_vs_oracle"] = round(gate["psnr"], 2)
        record["psnr_gate_db"] = PSNR_GATE_DB
        record["psnr_oracle_coverage"] = gate.get("psnr_coverage", 0.0)
        if gate.get("complete"):
            record["acc_contrib_relerr"] = round(
                gate["acc_contrib_relerr"], 5
            )
            record["acc_surf_underrun"] = round(gate["acc_surf_underrun"], 5)
            record["acc_surf_bad_finite_frac"] = round(
                gate["acc_surf_bad_finite_frac"], 6
            )
            psnr_ok = (
                gate["psnr"] >= PSNR_GATE_DB
                and gate["acc_contrib_relerr"] <= ACC_RELERR_GATE
                and gate["acc_surf_underrun"] <= 0.0
                and gate["acc_surf_bad_finite_frac"] <= 0.0
            )
            record["psnr_gate_pass"] = psnr_ok
        elif gate.get("psnr") is not None and gate.get(
            "psnr_coverage", 0.0
        ) < 1.0:
            # Partial coverage: report the covered-row PSNR + coverage,
            # but emit NO pass verdict — corruption can be spatially
            # localized (e.g. only the pair-dense central tiles), so a
            # top-rows subset must not certify the renderer.  A
            # below-gate partial PSNR IS reported as a failure: rows
            # that corrupt are decisive evidence even before the rest
            # of the oracle exists.
            if gate["psnr"] < PSNR_GATE_DB:
                psnr_ok = False
                record["psnr_gate_pass"] = False
        emit()

    # Stage 4 (opt-in): the other blend implementation's sweep time on
    # the same in-memory scene/cameras (sweep-only; the rest of the
    # pipeline is blend-independent).
    if compare and on_tpu and time_left() > 120.0:
        cameras, wp, hp = make_cameras(
            n_cams, width, height, with_masks=with_masks
        )
        from gs2pc.ops.rasterize import auto_pair_budget

        import jax.numpy as jnp

        scene_d = scene.to_device()
        probe_arrays = (
            scene_d.xyz, scene_d.covariance_factors(), scene_d.opacities,
            scene_d.colours, jnp.ones(scene_d.num_gaussians, bool),
        )
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, run_cap=4096, run_chunk=128,
            tile_batch=128, compact=True,
        )
        cfg = cfg._replace(
            pair_budget=auto_pair_budget(
                probe_arrays, cameras, cfg,
                calc_surface_distance=calc_surface,
            )
        )
        other = not primary_pallas
        t_other_sweep = time_sweep_only(
            scene_d, cameras, cfg, other, calc_surface
        )
        record[f"{'pallas' if other else 'xla'}_sweep_s"] = round(
            t_other_sweep, 3
        )
        emit()

    if tmp is not None:
        tmp.cleanup()
    if not psnr_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

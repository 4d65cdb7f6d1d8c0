"""End-to-end benchmark at the NORTH-STAR definition (BASELINE.json):

  3M-Gaussian scene -> 10M-point coloured cloud, 45 cameras @ 1280x720
  (colour_quality "high"), surface distances ON, pixel masks exercised,
  visibility-prioritised budgeting — the MipNeRF360-class workload the
  <30 s / one-chip target is defined against (reference workflow:
  README.md:104-109, camera_skip_rate 4 over a full capture).

Measures the full device pipeline with BOTH blend implementations
(Pallas kernel and XLA) and prints ONE JSON line whose headline value is
the best end-to-end rate; extra keys attest which blend ran, per-phase
seconds, truncation counters, and a FLOP/MFU estimate.

The reference repo publishes no quantitative numbers (BASELINE.md), so
``vs_baseline`` is measured against the north-star target rate derived
from BASELINE.json: 10M points in 30 s  =>  333,333 points/s.

Env knobs: GS2PC_BENCH_GAUSSIANS, GS2PC_BENCH_POINTS, GS2PC_BENCH_CAMERAS,
GS2PC_BENCH_WIDTH, GS2PC_BENCH_HEIGHT, GS2PC_BENCH_PALLAS (auto|1|0),
GS2PC_BENCH_BOTH (1 = run both blends, default), GS2PC_BENCH_SURFACE,
GS2PC_BENCH_MASKS.
"""

import json
import os
import time

import numpy as np

NORTH_STAR_POINTS_PER_S = 10_000_000 / 30.0

# Per-(pair, pixel) blend FLOP estimate for the MFU figure: power (6),
# exp (~8), alpha/test (4), colour/depth/invdepth accumulation (10),
# transmittance update (2) ~= 30 flops, x2 for the surface second pass's
# |depth-ed| sweep amortised share.
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


def make_ball_scene(n, seed=0):
    """Legacy bench scene: a dense Gaussian ball every camera fully sees.

    Pathological by capture standards — every camera's frustum contains
    ALL n Gaussians and per-tile depth runs saturate the per-tile cap —
    so it stresses the per-pair machinery ~3x harder than any real
    MipNeRF360-style capture.  Kept selectable (GS2PC_BENCH_SCENE=ball)
    as a worst-case stress config."""
    from gs2pc.models.gaussians import Gaussians

    r = np.random.default_rng(seed)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    xyz = r.normal(size=(n, 3)).astype(np.float32)
    xyz *= (1.0 + 2.0 * r.uniform(size=(n, 1)).astype(np.float32) ** 4)
    log_scales = r.uniform(-6.5, -4.0, (n, 3)).astype(np.float32)
    big = r.uniform(size=n) < 0.1
    log_scales[big] = r.uniform(-4.0, -2.5, (big.sum(), 3)).astype(np.float32)
    return Gaussians.create(
        xyz,
        log_scales,
        quats,
        r.uniform(0, 1, (n, 3)).astype(np.float32),
        r.uniform(0.2, 1.0, n).astype(np.float32),
    )


def make_scene(n, seed=0, kind=None):
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
        return make_ball_scene(n, seed)

    from gs2pc.models.gaussians import Gaussians

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
    return Gaussians.create(xyz, log_scales, quats, colours, opac)


def make_cameras(n_cams, width, height, focal_scale=0.9, with_masks=False):
    from gs2pc.camera import build_camera_batch

    transforms, intr = {}, {}
    focal = focal_scale * width
    names = []
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
        names.append(f"c{i:02d}")
    masks = None
    if with_masks:
        # Elliptical vignette mask (~86% of pixels live): exercises the
        # per-pixel mask path on every camera like a real masked capture.
        ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
        e = (
            ((xs - width / 2) / (width * 0.55)) ** 2
            + ((ys - height / 2) / (height * 0.55)) ** 2
        )
        m = (e <= 1.0).astype(np.uint8)
        masks = {name: m for name in names}
    return build_camera_batch(transforms, intr, masks=masks)


def run_pipeline(scene, cameras, cfg, use_pallas, n_points, n_cap,
                 calc_surface, seed):
    """Two jitted phases (sweep, sample), each fetch-synced for honest
    wall-clock through the tunnelled backend."""
    import jax
    import jax.numpy as jnp

    from gs2pc.ops.sampler import distribute_points, sample_points
    from gs2pc.parallel.sweep import render_sweep_chunked
    from gs2pc.utils.platform import fetch_sync

    arrays = (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities,
        scene.colours,
        jnp.ones(scene.num_gaussians, bool),
    )

    # Dispatch-bounded sweep, exactly as the production pipeline runs it
    # (several bounded device programs; byte-identical to one monolithic
    # scan — see gs2pc.parallel.sweep.PAIRS_PER_DISPATCH).
    def sweep_fn(arrays, cameras):
        return render_sweep_chunked(
            arrays, cameras, cfg,
            calc_surface_distance=calc_surface, use_pallas=use_pallas,
        )

    @jax.jit
    def sample_fn(key, scene, acc):
        sizes = scene.magnitudes(contributions=acc.total_contribution)
        # Pipeline-equivalent visibility cull (visibility_threshold 0.05).
        sizes = jnp.where(acc.max_contribution > 0.05, sizes, 0.0)
        ppg = distribute_points(sizes, n_points)
        out = sample_points(
            jax.random.PRNGKey(seed), scene, ppg, n_cap=n_cap,
            num_attempts=5,
        )
        return out.points, out.colours, out.valid

    # Warmup / compile both phases.
    acc = sweep_fn(arrays, cameras)
    fetch_sync(acc)
    outs = sample_fn(0, scene, acc)
    fetch_sync(outs)

    t0 = time.perf_counter()
    acc = sweep_fn(arrays, cameras)
    fetch_sync(acc)
    t_sweep = time.perf_counter() - t0

    t1 = time.perf_counter()
    pts, cols, valid = sample_fn(seed, scene, acc)
    fetch_sync((pts, cols, valid))
    t_sample = time.perf_counter() - t1

    n_emitted = int(np.asarray(valid.sum()))
    nd = (
        np.asarray(acc.n_dropped).tolist()
        if acc.n_dropped is not None else [0.0, 0.0, 0.0, 0.0]
    )
    return {
        "t_sweep": t_sweep,
        "t_sample": t_sample,
        "t_total": t_sweep + t_sample,
        "n_emitted": n_emitted,
        "pairs_blended": nd[0],
        "window_dropped": nd[1],
        "runcap_dropped": nd[2],
        "runcap_dropped_live": nd[3] if len(nd) > 3 else nd[2],
    }


def main():
    from gs2pc.utils.platform import honour_platform_env

    honour_platform_env()  # let JAX_PLATFORMS=cpu smoke tests actually run on CPU

    import jax

    from gs2pc.ops.rasterize import TileConfig
    from gs2pc.utils.platform import is_tpu_backend

    n_gauss = int(os.environ.get("GS2PC_BENCH_GAUSSIANS", 3_000_000))
    n_points = int(os.environ.get("GS2PC_BENCH_POINTS", 10_000_000))
    n_cams = int(os.environ.get("GS2PC_BENCH_CAMERAS", 45))
    width = int(os.environ.get("GS2PC_BENCH_WIDTH", 1280))
    height = int(os.environ.get("GS2PC_BENCH_HEIGHT", 720))
    calc_surface = os.environ.get("GS2PC_BENCH_SURFACE", "1") == "1"
    with_masks = os.environ.get("GS2PC_BENCH_MASKS", "1") == "1"
    pallas_env = os.environ.get("GS2PC_BENCH_PALLAS", "auto")
    run_both = os.environ.get("GS2PC_BENCH_BOTH", "1") == "1"

    on_tpu = is_tpu_backend()
    if pallas_env == "auto":
        primary_pallas = on_tpu
    else:
        primary_pallas = pallas_env == "1"

    dev = jax.devices()[0]
    scene = make_scene(n_gauss).calculate_normals()
    cameras, wp, hp = make_cameras(
        n_cams, width, height, with_masks=with_masks
    )
    cfg = TileConfig(
        width_pad=wp, height_pad=hp,
        slots=16, run_cap=4096, run_chunk=128, tile_batch=128,
    )
    # Auto-size the pair budget exactly as the production pipeline does.
    import jax.numpy as jnp

    from gs2pc.ops.rasterize import auto_pair_budget

    probe_arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )
    cfg = cfg._replace(
        pair_budget=auto_pair_budget(
            probe_arrays, cameras, cfg, calc_surface_distance=calc_surface
        )
    )
    n_cap = n_points + max(4096, n_points // 20)

    variants = [("pallas" if primary_pallas else "xla", primary_pallas)]
    if run_both:
        variants.append(("xla" if primary_pallas else "pallas",
                         not primary_pallas))
    # The Pallas kernel only exists on TPU hardware; skip that variant
    # elsewhere rather than timing interpret mode.
    variants = [
        (name, up) for name, up in variants if not (up and not on_tpu)
    ]

    results = {}
    for name, up in variants:
        results[name] = run_pipeline(
            scene, cameras, cfg, up, n_points, n_cap, calc_surface, seed=1
        )

    best_name = min(results, key=lambda k: results[k]["t_total"])
    best = results[best_name]
    pps = best["n_emitted"] / best["t_total"]

    # MFU estimate: blend FLOPs = pairs_blended (whole sweep) x 256
    # pixels/tile x ~30 flops, over the sweep wall-clock.
    blend_flops = best["pairs_blended"] * TPX * FLOPS_PER_PAIR_PIXEL
    mfu = blend_flops / max(best["t_sweep"], 1e-9) / peak_flops_for(dev)

    record = {
        "metric": (
            f"e2e_points_per_second[{n_gauss}g,{n_cams}cam@{width}x{height},"
            f"{n_points}pts,surface={int(calc_surface)},masks={int(with_masks)}]"
        ),
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / NORTH_STAR_POINTS_PER_S, 3),
        "blend": best_name,
        "scene": os.environ.get("GS2PC_BENCH_SCENE", "capture"),
        "pair_budget": cfg.pair_budget,
        "device": f"{getattr(dev, 'platform', '?')}:{getattr(dev, 'device_kind', '?')}",
        "t_total_s": round(best["t_total"], 3),
        "t_sweep_s": round(best["t_sweep"], 3),
        "t_sample_s": round(best["t_sample"], 3),
        "points": best["n_emitted"],
        "pairs_blended": best["pairs_blended"],
        "window_dropped": best["window_dropped"],
        "runcap_dropped": best["runcap_dropped"],
        "runcap_dropped_live": best["runcap_dropped_live"],
        "blend_mfu_est": round(mfu, 5),
    }
    for name, res in results.items():
        record[f"{name}_t_total_s"] = round(res["t_total"], 3)
        record[f"{name}_pps"] = round(res["n_emitted"] / res["t_total"], 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()

"""End-to-end benchmark: synthetic 3DGS scene -> coloured point cloud.

Measures the full device pipeline (render sweep over cameras for colours/
contributions + culling + point sampling) on whatever backend is default
(real TPU under the driver).  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no quantitative numbers (BASELINE.md), so
``vs_baseline`` is measured against the north-star target rate derived
from BASELINE.json: 10M points in 30 s  =>  333,333 points/s.

Env knobs: GS2PC_BENCH_GAUSSIANS, GS2PC_BENCH_POINTS, GS2PC_BENCH_CAMERAS,
GS2PC_BENCH_WIDTH, GS2PC_BENCH_HEIGHT, GS2PC_BENCH_PALLAS.
"""

import json
import os
import time

import numpy as np

NORTH_STAR_POINTS_PER_S = 10_000_000 / 30.0


def make_scene(n, seed=0):
    from gs2pc.models.gaussians import Gaussians

    r = np.random.default_rng(seed)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    # Mix of a dense core and a sparse shell; scale statistics shaped like
    # real 3DGS exports: ~90% small detail splats, ~10% larger fillers.
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


def make_cameras(n_cams, width, height, focal_scale=0.9):
    from gs2pc.camera import build_camera_batch

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
    return build_camera_batch(transforms, intr)


def main():
    import jax
    import jax.numpy as jnp

    from gs2pc.ops.rasterize import TileConfig
    from gs2pc.ops.sampler import distribute_points, sample_points
    from gs2pc.parallel.sweep import render_sweep

    n_gauss = int(os.environ.get("GS2PC_BENCH_GAUSSIANS", 1_000_000))
    n_points = int(os.environ.get("GS2PC_BENCH_POINTS", 5_000_000))
    n_cams = int(os.environ.get("GS2PC_BENCH_CAMERAS", 6))
    width = int(os.environ.get("GS2PC_BENCH_WIDTH", 1280))
    height = int(os.environ.get("GS2PC_BENCH_HEIGHT", 720))
    # Default mirrors the pipeline's "auto": Pallas blend on TPU backends.
    pallas_env = os.environ.get("GS2PC_BENCH_PALLAS", "auto")
    if pallas_env == "auto":
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = pallas_env == "1"

    scene = make_scene(n_gauss).calculate_normals()
    cameras, wp, hp = make_cameras(n_cams, width, height)
    cfg = TileConfig(
        width_pad=wp, height_pad=hp,
        slots=16, run_cap=4096, run_chunk=128, tile_batch=128,
    )
    arrays = (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities,
        scene.colours,
        jnp.ones(scene.num_gaussians, bool),
    )

    n_cap = n_points + max(4096, n_points // 20)

    # ONE fused jit: render sweep -> visibility-weighted budget -> sample.
    # Every extra output buffer of a dispatch costs a tunnel round trip on
    # the axon backend (~28 ms each, measured), so the whole device
    # pipeline runs as a single call with three outputs.  Scene/camera
    # arrays are ARGUMENTS, not closures — closed-over device arrays embed
    # as HLO constants, and a 3M-Gaussian module then exceeds the remote
    # compiler's request-size limit.
    @jax.jit
    def pipeline(key, arrays, cameras, scene):
        acc = render_sweep(
            arrays, cameras, cfg,
            calc_surface_distance=False, use_pallas=use_pallas,
        )
        sizes = scene.magnitudes(contributions=acc.total_contribution)
        ppg = distribute_points(sizes, n_points)
        out = sample_points(key, scene, ppg, n_cap=n_cap, num_attempts=5)
        return out.points, out.colours, out.valid

    # Warmup / compile.  block_until_ready is NOT trustworthy through the
    # axon tunnel (it can return before execution finishes); fetching a
    # value is the only honest sync, so timings bracket a 1-element get.
    pts, cols, valid = pipeline(jax.random.PRNGKey(0), arrays, cameras, scene)
    np.asarray(pts[0, 0])

    elapsed = float("inf")
    for rep in range(1, 3):
        t0 = time.perf_counter()
        pts, cols, valid = pipeline(
            jax.random.PRNGKey(rep), arrays, cameras, scene
        )
        np.asarray(pts[0, 0])
        elapsed = min(elapsed, time.perf_counter() - t0)

    n_emitted = int(jnp.sum(valid))
    pps = n_emitted / elapsed
    print(
        json.dumps(
            {
                "metric": f"e2e_points_per_second[{n_gauss}g,{n_cams}cam@{width}x{height},{n_points}pts]",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / NORTH_STAR_POINTS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

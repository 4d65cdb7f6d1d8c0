"""Per-phase timing breakdown of the conversion pipeline on the default
backend (TPU under the driver).  Diagnostics companion to bench.py.

    python tools/bench_breakdown.py [--gaussians 1000000] [--points 5000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from gs2pc.ops import rasterize
from gs2pc.ops.projection import preprocess
from gs2pc.ops.rasterize import TileConfig
from gs2pc.ops.sampler import distribute_points, sample_points
from gs2pc.parallel.sweep import render_sweep


from gs2pc.utils.platform import fetch_sync as _fetch


def timed(fn, *args, reps=2):
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--points", type=int, default=5_000_000)
    ap.add_argument("--cams", type=int, default=2)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument(
        "--pair_budget_log2", type=int, default=0,
        help="Explicit pair budget as a power of two (0 = legacy derivation)",
    )
    ap.add_argument(
        "--auto_budget", action="store_true",
        help="Size the pair budget with the production coverage probe",
    )
    ap.add_argument(
        "--compact", action="store_true",
        help="Production compact rgb24 pair tables + surface compaction",
    )
    args = ap.parse_args()

    scene = bench.make_scene(args.gaussians).calculate_normals()
    cameras, wp, hp = bench.make_cameras(args.cams, args.width, args.height)
    cam = cameras.at(0)
    cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                     run_cap=4096, run_chunk=128, tile_batch=128,
                     compact=args.compact, surface_compact=args.compact,
                     pair_budget=(
                         1 << args.pair_budget_log2
                         if args.pair_budget_log2 else 0
                     ))
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )
    if args.auto_budget:
        cfg = cfg._replace(
            pair_budget=rasterize.auto_pair_budget(arrays, cameras, cfg)
        )
        print(f"auto pair budget: {cfg.pair_budget:,}")

    @jax.jit
    def prep_only(means, covf, op, col, alive, surf=False):
        return preprocess(
            means, covf, op, alive, cam.viewmatrix, cam.projmatrix,
            cam.tanfovx, cam.tanfovy, cam.focal_x, cam.focal_y,
            cam.width, cam.height, adaptive_radius=not surf,
        )

    t_prep = timed(jax.jit(prep_only), *arrays)
    print(f"preprocess only:                        {t_prep*1000:8.1f} ms/cam")

    def expand_only(means, covf, op, col, alive):
        prep = prep_only(means, covf, op, col, alive)
        keys, pair_g, _ = rasterize._build_pairs(prep, cfg, sort=False)
        return keys.sum() + pair_g[0]

    t_exp = timed(jax.jit(expand_only), *arrays)
    print(f"preprocess+pair-expand (no sort):       {t_exp*1000:8.1f} ms/cam")

    def binning(means, covf, op, col, alive):
        prep = prep_only(means, covf, op, col, alive)
        keys, pair_g, _ = rasterize._build_pairs(prep, cfg)
        tids = jnp.arange(cfg.num_tiles_pad, dtype=jnp.int32)
        starts = jnp.searchsorted(keys, tids)
        return starts.sum() + pair_g[0]

    t_bin = timed(jax.jit(binning), *arrays)
    print(f"preprocess+pair-expand+sort+ranges:     {t_bin*1000:8.1f} ms/cam")

    def aligned(means, covf, op, col, alive):
        from gs2pc.ops.pallas_blend import build_aligned_pairs

        prep = prep_only(means, covf, op, col, alive)
        P = means.shape[0]
        table = rasterize.pack_blend_table(prep, col, compact=cfg.compact)
        keys, gid, _ = rasterize._build_pairs(prep, cfg)
        pairs = build_aligned_pairs(
            table, keys, gid,
            num_tiles_pad=cfg.num_tiles_pad, run_cap=cfg.run_cap,
            run_chunk=cfg.run_chunk,
        )
        # Consume the full pair table (a strided sample XLA cannot DCE) —
        # the table build IS this stage's cost.
        return (
            pairs.total + pairs.gid[0]
            + pairs.pair_tab[:, :: 4097].sum() + pairs.counts.sum()
        )

    t_al = timed(jax.jit(aligned), *arrays)
    print(f"  + aligned pair build (pallas):        {t_al*1000:8.1f} ms/cam")

    for use_pallas in (False, True):
        for surf in (False, True):
            sweep = jax.jit(
                lambda a, c, s=surf, up=use_pallas: render_sweep(
                    a, c, cfg, calc_surface_distance=s, use_pallas=up
                )
            )
            t = timed(sweep, arrays, cameras) / args.cams
            blend = "pallas" if use_pallas else "xla"
            print(
                f"full sweep ({blend:6}, surface={surf!s:5}):  {t*1000:8.1f} ms/cam"
            )

    # Masked variant (pallas, surface) — the e2e bench runs with masks on,
    # and the mask -> tile_live path has its own cost.
    cameras_m, _, _ = bench.make_cameras(
        args.cams, args.width, args.height, with_masks=True
    )
    sweep_m = jax.jit(
        lambda a, c: render_sweep(
            a, c, cfg, calc_surface_distance=True, use_pallas=True
        )
    )
    t = timed(sweep_m, arrays, cameras_m) / args.cams
    print(f"full sweep (pallas, surface, masks):    {t*1000:8.1f} ms/cam")

    n_cap = args.points + args.points // 20
    contrib = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (args.gaussians,)))

    @jax.jit
    def sampling(key, sc, c):
        # scene passed as an ARGUMENT: closing over 3M-Gaussian device
        # arrays embeds them as HLO constants and blows the remote
        # compiler's request-size limit.
        sizes = sc.magnitudes(contributions=c)
        ppg = distribute_points(sizes, args.points)
        out = sample_points(key, sc, ppg, n_cap=n_cap, num_attempts=5)
        return out.points, out.valid

    t_s = timed(sampling, jax.random.PRNGKey(0), scene, contrib)
    print(f"point sampling ({args.points} pts):     {t_s*1000:8.1f} ms")


if __name__ == "__main__":
    main()

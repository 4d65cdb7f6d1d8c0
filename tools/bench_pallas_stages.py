"""Stage-level timing of the Pallas render path on the default backend.

    python tools/bench_pallas_stages.py [--gaussians 1000000]

Isolates: preprocess, pair expand+sort, aligned table
build, blend kernel, post reductions — the DESIGN §7 table, refreshed.
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
from gs2pc.ops.pallas_blend import build_aligned_pairs
from gs2pc.ops.projection import preprocess
from gs2pc.ops.rasterize import TileConfig


from gs2pc.utils.platform import fetch_sync as _fetch


def timed(fn, *args, reps=3):
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--surface", action="store_true")
    ap.add_argument("--compact", action="store_true",
                    help="compact 8-lane pair rows (production default)")
    ap.add_argument("--pair_budget_log2", type=int, default=0)
    ap.add_argument("--auto_budget", action="store_true",
                    help="size the pair budget from the coverage probe "
                         "exactly as the production pipeline does")
    ap.add_argument("--run_chunk", type=int, default=128,
                    help="pairs per kernel chunk (DMA slab width)")
    ap.add_argument("--surface_compact", action="store_true")
    args = ap.parse_args()

    scene = bench.make_scene(args.gaussians)
    cameras, wp, hp = bench.make_cameras(1, args.width, args.height)
    cam = cameras.at(0)
    cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                     run_cap=4096, run_chunk=args.run_chunk, tile_batch=128,
                     compact=args.compact,
                     surface_compact=args.surface_compact,
                     pair_budget=(1 << args.pair_budget_log2
                                  if args.pair_budget_log2 else 0))
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )
    if args.auto_budget:
        cfg = cfg._replace(pair_budget=rasterize.auto_pair_budget(
            arrays, cameras, cfg, calc_surface_distance=args.surface,
        ))
        print(f"auto pair budget: {cfg.pair_budget:,}")

    @jax.jit
    def stage_prep(means, covf, op, col, alive):
        return preprocess(
            means, covf, op, alive, cam.viewmatrix, cam.projmatrix,
            cam.tanfovx, cam.tanfovy, cam.focal_x, cam.focal_y,
            cam.width, cam.height,
        )

    t, prep = timed(stage_prep, *arrays)
    print(f"preprocess:            {t*1000:8.1f} ms")

    @jax.jit
    def stage_pairs(prep):
        return rasterize._build_pairs(prep, cfg)

    t, (keys, pair_gid, _) = timed(stage_pairs, prep)
    n_real = int(jnp.searchsorted(keys, jnp.int32(cfg.num_tiles)))
    print(f"pair expand+sort:      {t*1000:8.1f} ms   (L={keys.shape[0]}, real={n_real})")

    def make_table(prep):
        return rasterize.pack_blend_table(
            prep, scene.colours, compact=args.compact
        )

    t, table = timed(jax.jit(make_table), prep)
    print(f"packed table build:    {t*1000:8.1f} ms")

    @jax.jit
    def stage_aligned(table, keys, pair_gid):
        return build_aligned_pairs(
            table, keys, pair_gid,
            num_tiles_pad=cfg.num_tiles_pad, run_cap=cfg.run_cap,
            run_chunk=cfg.run_chunk,
        )

    t, pairs = timed(stage_aligned, table, keys, pair_gid)
    print(f"aligned table build:   {t*1000:8.1f} ms   (L_al={pairs.pair_tab.shape[1]}, occupied={int(pairs.total)})")

    from gs2pc.ops.pallas_blend import pallas_blend

    @jax.jit
    def stage_blend(pairs):
        mask_tiles = jnp.ones((cfg.num_tiles_pad, 256), jnp.uint8)
        return pallas_blend(
            pairs, mask_tiles, cam.width, cam.height,
            num_tiles=cfg.num_tiles, num_tiles_pad=cfg.num_tiles_pad,
            grid_w=cfg.grid_w, width_pad=cfg.width_pad,
            run_chunk=cfg.run_chunk, white_bkgd=True,
            run_cap_hint=cfg.run_cap, with_surface=args.surface,
            surface_compact=cfg.surface_compact,
        )

    t, blend_out = timed(stage_blend, pairs)
    print(f"blend kernel (surface={args.surface!s:5}): {t*1000:6.1f} ms")
    print(f"  compact pair stream: {int(blend_out[7])} of "
          f"{int(pairs.total)} aligned (early-exit skipped the rest)")

    P = args.gaussians

    @jax.jit
    def stage_post(pairs, blend_out):
        rgb, _, _, _, m_c, apix_c, gid_c, total_c, sd_al, _ = blend_out
        from gs2pc.ops.rasterize import _pair_reduce, _sd_reduce, _untile
        image = _untile(rgb, cfg)
        out = _pair_reduce(gid_c, m_c, apix_c, image, P, total_c)
        if args.surface:
            return out + (_sd_reduce(pairs.gid, sd_al, P, pairs.total),)
        return out

    t, _ = timed(stage_post, pairs, blend_out)
    print(f"post reductions:       {t*1000:8.1f} ms")

    @jax.jit
    def full(means, covf, op, col, alive):
        return rasterize.render_tile_camera(
            means, covf, op, col, alive, cam, cfg,
            calc_surface_distance=args.surface, use_pallas=True,
        )

    t, _ = timed(full, *arrays)
    print(f"full camera (pallas):  {t*1000:8.1f} ms")


if __name__ == "__main__":
    main()

"""PSNR validation harness: tile renderer vs the dense exact oracle.

Operationalises the BASELINE.json north-star quality metric ("colour PSNR
>= reference pipeline"): renders the same cameras with the production tile
rasterizer and the dense oracle and reports image PSNR plus accumulator
deltas.  Works on a scene file or a procedural scene.

    python tools/validate_psnr.py [--input_path scene.ply]
        [--transform_path sparse/0] [--cams 3] [--gaussians 20000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gs2pc.camera import build_camera_batch
from gs2pc.ops.dense_render import render_dense
from gs2pc.ops.rasterize import TileConfig, render_tile_camera


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(1.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_path", default=None)
    ap.add_argument("--transform_path", default=None)
    ap.add_argument("--max_sh_degree", type=int, default=3)
    ap.add_argument("--cams", type=int, default=3)
    ap.add_argument("--gaussians", type=int, default=20000,
                    help="procedural scene size when no input_path given")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    args = ap.parse_args()

    if args.input_path:
        from gs2pc.io.gaussians_io import load_gaussians

        scene = load_gaussians(args.input_path, max_sh_degree=args.max_sh_degree)
    else:
        import bench

        scene = bench.make_scene(args.gaussians)

    if args.transform_path:
        from gs2pc.io.colmap import load_transform_data

        transforms, intrinsics = load_transform_data(args.transform_path)
        names = list(transforms)[: args.cams]
        transforms = {k: transforms[k] for k in names}
        cameras, wp, hp = build_camera_batch(
            transforms, intrinsics, colour_resolution=args.width
        )
    else:
        import bench

        cameras, wp, hp = bench.make_cameras(args.cams, args.width, args.height)

    cfg = TileConfig(width_pad=wp, height_pad=hp, slots=32,
                     run_cap=4096, run_chunk=128, tile_batch=64)
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )

    worst = float("inf")
    for i in range(cameras.num_cameras):
        cam = cameras.at(i)
        out_t = render_tile_camera(*arrays, cam, cfg, calc_surface_distance=False)
        out_d = render_dense(
            *arrays, cam, wp, hp, chunk=256, calc_surface_distance=False
        )
        w, h = int(cam.width), int(cam.height)
        p = psnr(out_t.image[:h, :w], out_d.image[:h, :w])
        dc = float(jnp.abs(out_t.contrib - out_d.contrib).max())
        worst = min(worst, p)
        print(f"cam {i}: PSNR {p:6.2f} dB   max |contrib delta| {dc:.2e}")

    print(f"\nworst-case PSNR vs exact oracle: {worst:.2f} dB "
          f"(>= 40 dB is visually lossless)")


if __name__ == "__main__":
    main()

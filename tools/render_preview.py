"""Render preview images / depth maps from a 3DGS scene.

Debug-visualisation capability the reference keeps commented out
(gauss_to_pc.py:456-471); here it is a first-class tool:

    python tools/render_preview.py --input_path scene.ply \
        --transform_path sparse/0 --out_dir previews --max_images 4 [--depth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gs2pc.camera import build_camera_batch
from gs2pc.io.colmap import load_transform_data
from gs2pc.io.gaussians_io import load_gaussians
from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from gs2pc.utils.config import COLOR_QUALITY_OPTIONS
from gs2pc.utils.imaging import imwrite


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_path", required=True)
    ap.add_argument("--transform_path", required=True)
    ap.add_argument("--out_dir", default="previews")
    ap.add_argument("--max_images", type=int, default=4)
    ap.add_argument("--colour_quality", default="medium")
    ap.add_argument("--depth", action="store_true", help="also save depth maps")
    ap.add_argument("--max_sh_degree", type=int, default=3)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    scene = load_gaussians(args.input_path, max_sh_degree=args.max_sh_degree)
    transforms, intrinsics = load_transform_data(args.transform_path)
    names = list(transforms)[: args.max_images]
    transforms = {k: transforms[k] for k in names}
    cameras, wp, hp = build_camera_batch(
        transforms, intrinsics,
        colour_resolution=COLOR_QUALITY_OPTIONS[args.colour_quality.lower()],
    )
    cfg = TileConfig(width_pad=wp, height_pad=hp)
    arrays = (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities,
        scene.colours,
        jnp.ones(scene.num_gaussians, bool),
    )
    for i, name in enumerate(names):
        cam = cameras.at(i)
        out = render_tile_camera(*arrays, cam, cfg, calc_surface_distance=False)
        w, h = int(cam.width), int(cam.height)
        img = np.asarray(out.image)[:h, :w]
        imwrite(os.path.join(args.out_dir, f"{name}.png"), img)
        if args.depth:
            depth = np.asarray(out.depth)[:h, :w]
            dmin, dmax = depth.min(), depth.max()
            norm = (depth - dmin) / max(dmax - dmin, 1e-9)
            imwrite(os.path.join(args.out_dir, f"{name}_depth.png"), norm)
        print(f"wrote {name} ({w}x{h})")


if __name__ == "__main__":
    main()

"""Convert Gaussian scenes between .ply and .splat.

    python tools/convert_format.py scene.ply scene.splat
    python tools/convert_format.py scene.splat scene.ply

.splat stores linear scales / u8 colours+rotations; converting .ply -> .splat
keeps degree-0 colour only (the format has no SH fields).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gs2pc.utils.platform import honour_platform_env

honour_platform_env()  # host-only tool: JAX_PLATFORMS=cpu must win


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--max_sh_degree", type=int, default=3)
    args = ap.parse_args()

    from gs2pc.io.gaussians_io import load_gaussians
    from gs2pc.io.splat import save_splat

    src_ext = os.path.splitext(args.src)[1]
    dst_ext = os.path.splitext(args.dst)[1]
    scene = load_gaussians(args.src, max_sh_degree=args.max_sh_degree)

    if dst_ext == ".splat":
        save_splat(
            args.dst,
            np.asarray(scene.xyz),
            np.asarray(scene.log_scales),
            np.asarray(scene.rots),
            np.asarray(scene.colours),
            np.asarray(scene.opacities),
        )
    elif dst_ext == ".ply":
        # Gaussian-scene PLY with RGB colours (no SH round-trip from .splat).
        n = scene.num_gaussians
        props = (
            ["x", "y", "z"]
            + ["red", "green", "blue"]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "property float opacity\n"
            + "".join(f"property float scale_{i}\n" for i in range(3))
            + "".join(f"property float rot_{i}\n" for i in range(4))
            + "end_header\n"
        )
        dtype = (
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
             ("red", "u1"), ("green", "u1"), ("blue", "u1"),
             ("opacity", "<f4")]
            + [(f"scale_{i}", "<f4") for i in range(3)]
            + [(f"rot_{i}", "<f4") for i in range(4)]
        )
        rec = np.zeros(n, dtype)
        xyz = np.asarray(scene.xyz)
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        cols = np.clip(np.asarray(scene.colours) * 255, 0, 255).astype(np.uint8)
        rec["red"], rec["green"], rec["blue"] = cols[:, 0], cols[:, 1], cols[:, 2]
        # store raw (pre-sigmoid) opacity like exporters do
        op = np.clip(np.asarray(scene.opacities), 1e-6, 1 - 1e-6)
        rec["opacity"] = np.log(op / (1 - op))
        ls = np.asarray(scene.log_scales)
        for i in range(3):
            rec[f"scale_{i}"] = ls[:, i]
        q = np.asarray(scene.rots)
        for i in range(4):
            rec[f"rot_{i}"] = q[:, i]
        with open(args.dst, "wb") as fh:
            fh.write(header.encode())
            fh.write(rec.tobytes())
    else:
        raise SystemExit(f"Unsupported destination type {dst_ext}")
    print(f"{args.src} ({src_ext}) -> {args.dst} ({dst_ext}): {scene.num_gaussians} gaussians")


if __name__ == "__main__":
    main()

"""Diagnose WHERE the tile render differs from the dense oracle at the
PSNR-gate scale: error statistics by pixel/tile, largest-error tiles, and
row/column marginals (band-boundary artifacts vs tile-shaped artifacts)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gs2pc.utils.platform import honour_platform_env

honour_platform_env()

import jax
import jax.numpy as jnp

from bench import make_cameras, make_scene
from gs2pc.cli import enable_compilation_cache
from gs2pc.ops.rasterize import TileConfig, auto_pair_budget, render_tile_camera

WIDTH, HEIGHT = 1280, 720


def main():
    enable_compilation_cache()
    n_gauss = int(os.environ.get("ABLATE_GAUSS", 1_000_000))
    oracle = np.load(f"/tmp/ablate_oracle_{n_gauss}.npz")["image"]

    scene = make_scene(n_gauss, seed=2)
    cameras, wp, hp = make_cameras(1, WIDTH, HEIGHT)
    cam = cameras.at(0)
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )
    cfg = TileConfig(
        width_pad=wp, height_pad=hp, run_cap=65536, run_chunk=128,
        tile_batch=128, compact=False, surface_compact=True,
    )
    cfg = cfg._replace(pair_budget=auto_pair_budget(arrays, cameras, cfg))

    img = np.asarray(
        jax.jit(
            lambda a: render_tile_camera(
                *a, cam, cfg, use_pallas=True, calc_surface_distance=True
            ).image
        )(arrays)
    )
    np.savez_compressed("/tmp/diff_tile_img.npz", image=img)

    h, w = HEIGHT, WIDTH
    d = np.abs(img[:h, :w] - oracle[:h, :w]).max(axis=2)  # (h, w)
    print(f"max err {d.max():.4f}  mean {d.mean():.6f}")
    for thr in (0.5, 0.1, 0.01, 1e-3):
        print(f"px with err > {thr}: {(d > thr).sum()}")

    # tile-level (16x16) error map
    th, tw = h // 16, w // 16
    dt = d[: th * 16, : tw * 16].reshape(th, 16, tw, 16).max(axis=(1, 3))
    bad = np.argwhere(dt > 0.1)
    print(f"tiles with max err > 0.1: {len(bad)} / {th * tw}")
    print("worst 20 tiles (ty, tx, err):")
    order = np.argsort(-dt.ravel())[:20]
    for o in order:
        ty, tx = divmod(o, tw)
        print(f"  ({ty:3d},{tx:3d}) err {dt[ty, tx]:.4f}")
    # row marginal: band boundaries would show stripes every 51 rows
    rowmax = d.max(axis=1)
    print("row marginal (err>0.1 rows):", np.where(rowmax > 0.1)[0][:50])
    # check band boundary rows specifically (51-row bands)
    rows_per_band = (1 << 16) // wp
    print("rows_per_band =", rows_per_band)
    # sample a worst pixel
    iy, ix = np.unravel_index(np.argmax(d), d.shape)
    print(f"worst pixel ({iy},{ix}): tile={img[iy, ix]} oracle={oracle[iy, ix]}")


if __name__ == "__main__":
    main()

"""Dev tool: compare Pallas blend kernel vs XLA blend path on the TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gs2pc.camera import build_camera_batch
from gs2pc.models.gaussians import Gaussians
from gs2pc.ops.rasterize import TileConfig, render_tile_camera


def make_scene(n, seed=0, lo=-3.5, hi=-1.5, spread=1.0):
    r = np.random.default_rng(seed)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return Gaussians.create(
        r.uniform(-spread, spread, (n, 3)).astype(np.float32),
        r.uniform(lo, hi, (n, 3)).astype(np.float32),
        quats,
        r.uniform(0, 1, (n, 3)).astype(np.float32),
        r.uniform(0.3, 0.9, n).astype(np.float32),
    )


def make_cam(width=128, height=128, focal=150.0, dist=4.0):
    C = np.array([0, 0, -dist])
    z = -C / np.linalg.norm(C)
    up = np.array([0, 1, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, C
    c2w[:, 1:3] = -c2w[:, 1:3]
    cams, wp, hp = build_camera_batch(
        {"c": c2w.tolist()}, {"c": (width, height, focal, focal)}
    )
    return cams.at(0), wp, hp


def main():
    scene = make_scene(200)
    cam, wp, hp = make_cam()
    arrays = (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities,
        scene.colours,
        jnp.ones(scene.num_gaussians, bool),
    )
    cfg = TileConfig(
        width_pad=wp, height_pad=hp, slots=64,
        run_cap=256, run_chunk=128, tile_batch=16,
    )
    out_x = jax.jit(lambda *a: render_tile_camera(*a, cam, cfg))(*arrays)
    out_p = jax.jit(
        lambda *a: render_tile_camera(*a, cam, cfg, use_pallas=True)
    )(*arrays)
    print("image diff max:", float(jnp.abs(out_x.image - out_p.image).max()))
    print("ed diff max:", float(jnp.abs(out_x.depth - out_p.depth).max()))
    print("contrib diff max:", float(jnp.abs(out_x.contrib - out_p.contrib).max()))
    print(
        "surf diff max:",
        float(
            jnp.abs(
                jnp.minimum(out_x.surf_dist, 1e6) - jnp.minimum(out_p.surf_dist, 1e6)
            ).max()
        ),
    )
    print(
        "best_colour diff max:",
        float(jnp.abs(out_x.best_colour - out_p.best_colour).max()),
    )


if __name__ == "__main__":
    main()

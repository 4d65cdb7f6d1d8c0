"""Pallas blend kernel parity vs the XLA blend path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from tests.conftest import make_synthetic_scene
from tests.test_render import single_camera


def _arrays(n=150, seed=3):
    scene = make_synthetic_scene(n, seed=seed, spread=1.0, scale_lo=-3.5, scale_hi=-1.5)
    return (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities * 0.9,
        scene.colours,
        jnp.ones(n, bool),
    )


class TestPallasParity:
    def test_matches_xla_blend(self):
        cam, wp, hp = single_camera()
        arrays = _arrays()
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=32,
            run_cap=256, run_chunk=128, tile_batch=16,
        )
        out_x = render_tile_camera(*arrays, cam, cfg)
        out_p = render_tile_camera(
            *arrays, cam, cfg, use_pallas=True, pallas_interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out_x.image), np.asarray(out_p.image), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_x.contrib), np.asarray(out_p.contrib), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_x.depth), np.asarray(out_p.depth), atol=1e-5
        )
        sx = np.minimum(np.asarray(out_x.surf_dist), 1e6)
        sp = np.minimum(np.asarray(out_p.surf_dist), 1e6)
        np.testing.assert_allclose(sx, sp, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out_x.best_colour), np.asarray(out_p.best_colour), atol=1e-5
        )

    def test_mask_parity(self):
        cam, wp, hp = single_camera()
        arrays = _arrays(80, seed=5)
        mask = jnp.ones(hp * wp, jnp.uint8).at[: hp * wp // 2].set(0)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=32,
            run_cap=256, run_chunk=128, tile_batch=16,
        )
        out_x = render_tile_camera(*arrays, cam, cfg, mask=mask)
        out_p = render_tile_camera(
            *arrays, cam, cfg, mask=mask, use_pallas=True, pallas_interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out_x.image), np.asarray(out_p.image), atol=1e-5
        )

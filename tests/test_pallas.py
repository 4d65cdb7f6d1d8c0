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


class TestPallasShardExtensions:
    """The gauss-shard renderer extensions (init_trans / early_stop /
    want_trans / best_pix / surface_ed_override) must behave identically
    in the Pallas kernel and the XLA blend — one kernel for all call
    sites, like renderCUDA (forward.cu:303-497)."""

    def _setup(self, n=120, seed=9):
        cam, wp, hp = single_camera(width=64, height=48, focal=70.0)
        arrays = _arrays(n, seed=seed)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=32,
            run_cap=256, run_chunk=128, tile_batch=12,
        )
        return arrays, cam, cfg, wp, hp

    def _both(self, arrays, cam, cfg, **kw):
        out_x = render_tile_camera(*arrays, cam, cfg, **kw)
        out_p = render_tile_camera(
            *arrays, cam, cfg, use_pallas=True, pallas_interpret=True, **kw
        )
        return out_x, out_p

    def test_trigger_free_trans(self):
        arrays, cam, cfg, wp, hp = self._setup()
        out_x, out_p = self._both(
            arrays, cam, cfg,
            early_stop=False, want_trans=True, calc_surface_distance=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_x.trans), np.asarray(out_p.trans), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_x.image), np.asarray(out_p.image), atol=1e-5
        )

    def test_init_trans_seeding(self):
        arrays, cam, cfg, wp, hp = self._setup()
        r = np.random.default_rng(4)
        t0 = jnp.asarray(
            r.uniform(0.2, 1.0, wp * hp).astype(np.float32)
        )
        out_x, out_p = self._both(
            arrays, cam, cfg,
            init_trans=t0, calc_surface_distance=False, want_best_pix=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_x.image), np.asarray(out_p.image), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_x.contrib), np.asarray(out_p.contrib), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out_x.best_pix), np.asarray(out_p.best_pix)
        )

    def test_init_trans_below_eps_stops_immediately(self):
        """A pixel whose upstream product is already < T_EPS must trigger
        on its first candidate pair in both blends."""
        arrays, cam, cfg, wp, hp = self._setup()
        t0 = jnp.full((wp * hp,), 5e-5, jnp.float32)
        out_x, out_p = self._both(
            arrays, cam, cfg, init_trans=t0, calc_surface_distance=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_x.contrib), np.asarray(out_p.contrib), atol=1e-7
        )
        assert float(np.asarray(out_p.contrib).max()) == 0.0

    def test_surface_ed_override(self):
        arrays, cam, cfg, wp, hp = self._setup()
        r = np.random.default_rng(8)
        ed_ov = jnp.asarray(r.uniform(2.0, 6.0, wp * hp).astype(np.float32))
        out_x, out_p = self._both(
            arrays, cam, cfg,
            calc_surface_distance=True, surface_ed_override=ed_ov,
        )
        sx = np.minimum(np.asarray(out_x.surf_dist), 1e6)
        sp = np.minimum(np.asarray(out_p.surf_dist), 1e6)
        np.testing.assert_allclose(sx, sp, atol=1e-5)

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


class TestCompactPairRows:
    """Compact 8-lane blend-table rows (TileConfig.compact): rgb rides one
    exact-f32 24-bit lane, quantized to the output writer's own 8-bit
    precision (save_xyz_to_ply stores uchar colours)."""

    def _outs(self, compact, use_pallas):
        cam, wp, hp = single_camera()
        arrays = _arrays(150, seed=3)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=32,
            run_cap=256, run_chunk=128, tile_batch=16, compact=compact,
        )
        return render_tile_camera(
            *arrays, cam, cfg,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        )

    def test_compact_within_quantization_of_exact(self):
        """Image/best-colour deltas bounded by the 8-bit pre-blend
        rounding (<= 0.5/255 per channel; blending is a convex
        combination so the error cannot amplify).  Geometry-derived
        outputs (contrib, depth, surface) are colour-independent and
        must be BIT-identical."""
        exact = self._outs(compact=False, use_pallas=False)
        comp = self._outs(compact=True, use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(exact.image), np.asarray(comp.image),
            atol=1.5 / 255.0,
        )
        np.testing.assert_array_equal(
            np.asarray(exact.contrib), np.asarray(comp.contrib)
        )
        np.testing.assert_array_equal(
            np.asarray(exact.depth), np.asarray(comp.depth)
        )
        np.testing.assert_array_equal(
            np.asarray(exact.surf_dist), np.asarray(comp.surf_dist)
        )

    def test_pallas_xla_parity_under_compact(self):
        """Both blend paths read the SAME compact table, so compact mode
        preserves the Pallas-vs-XLA parity contract."""
        out_x = self._outs(compact=True, use_pallas=False)
        out_p = self._outs(compact=True, use_pallas=True)
        np.testing.assert_allclose(
            np.asarray(out_x.image), np.asarray(out_p.image), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_x.contrib), np.asarray(out_p.contrib), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_x.best_colour), np.asarray(out_p.best_colour),
            atol=1e-5,
        )

    def test_rgb24_roundtrip(self):
        from gs2pc.ops.rasterize import _unpack_rgb24

        r = np.random.default_rng(9)
        cols = r.uniform(0, 1, (256, 3)).astype(np.float32)
        q = np.round(cols * 255.0).astype(np.int32)
        packed = (q[:, 0] << 16) | (q[:, 1] << 8) | q[:, 2]
        un = np.asarray(_unpack_rgb24(jnp.asarray(packed, jnp.float32)))
        np.testing.assert_allclose(un, q / 255.0, atol=1e-7)


class TestCompactStream:
    def test_compact_total_matches_zero_tail(self):
        """The kernel's compact (m, apix, gid) stream: entries beyond the
        cursor are inert, and reducing the compact stream equals reducing
        the full aligned stream (validated implicitly by the parity tests
        above; here we check the cursor itself is plausible)."""
        from gs2pc.ops.pallas_blend import build_aligned_pairs, pallas_blend
        from gs2pc.ops.rasterize import pack_blend_table, _build_pairs
        from gs2pc.ops.projection import preprocess

        cam, wp, hp = single_camera()
        means, covf, op, col, alive = _arrays(150, seed=3)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=32,
            run_cap=256, run_chunk=128, tile_batch=16,
        )
        prep = preprocess(
            means, covf, op, alive, cam.viewmatrix, cam.projmatrix,
            cam.tanfovx, cam.tanfovy, cam.focal_x, cam.focal_y,
            cam.width, cam.height,
        )
        table = pack_blend_table(prep, col)
        keys, gid, _ = _build_pairs(prep, cfg)
        pairs = build_aligned_pairs(
            table, keys, gid, num_tiles_pad=cfg.num_tiles_pad,
            run_cap=cfg.run_cap, run_chunk=cfg.run_chunk,
        )
        mask_tiles = jnp.ones((cfg.num_tiles_pad, 256), jnp.uint8)
        out = pallas_blend(
            pairs, mask_tiles, cam.width, cam.height,
            num_tiles=cfg.num_tiles, num_tiles_pad=cfg.num_tiles_pad,
            grid_w=cfg.grid_w, width_pad=cfg.width_pad,
            run_chunk=cfg.run_chunk, white_bkgd=True,
            run_cap_hint=cfg.run_cap, with_surface=True, interpret=True,
        )
        m_c, apix_c, gid_c, total_c = out[4], out[5], out[6], out[7]
        total = int(total_c)
        assert 0 < total <= int(pairs.total)
        assert total % cfg.run_chunk == 0
        # Tail beyond the cursor is inert: zero m, sentinel gid.
        assert float(jnp.max(m_c[total:])) == 0.0 if total < m_c.shape[0] else True
        assert int(jnp.min(gid_c[:total])) >= 0

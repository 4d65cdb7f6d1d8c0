"""Renderer tests: projection geometry, dense oracle, tile-vs-dense parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs2pc.camera import build_camera_batch, make_camera
from gs2pc.ops.dense_render import render_dense
from gs2pc.ops.projection import mark_visible, preprocess
from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from gs2pc.ops.blend import FLOAT_MAX
from tests.conftest import make_synthetic_scene


def look_at_camera(distance=4.0, width=128, height=128, focal=150.0, angle=0.0):
    """NeRF-convention c2w for a camera on a circle looking at the origin."""
    # OpenCV convention: camera at C, +z toward origin.
    C = np.array(
        [distance * np.sin(angle), 0.0, -distance * np.cos(angle)]
    )
    z = -C / np.linalg.norm(C)  # toward origin
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w_cv = np.eye(4)
    c2w_cv[:3, 0], c2w_cv[:3, 1], c2w_cv[:3, 2], c2w_cv[:3, 3] = x, y, z, C
    c2w_nerf = c2w_cv.copy()
    c2w_nerf[:, 1:3] = -c2w_nerf[:, 1:3]  # flip is involutive
    return c2w_nerf, (width, height, focal, focal)


def single_camera(**kw):
    c2w, intr = look_at_camera(**kw)
    batch, wp, hp = build_camera_batch({"cam0": c2w.tolist()}, {"cam0": intr})
    return batch.at(0), wp, hp


class TestProjection:
    def test_center_projects_to_image_center(self):
        cam, wp, hp = single_camera()
        means = jnp.zeros((1, 3))
        covf = jnp.eye(3)[None] * 0.01
        prep = preprocess(
            means, covf, jnp.ones(1), jnp.ones(1, bool),
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
        )
        assert bool(prep.valid[0])
        np.testing.assert_allclose(float(prep.depth[0]), 4.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(prep.xy[0]), [63.5, 63.5], atol=1e-3)

    def test_behind_camera_culled(self):
        cam, _, _ = single_camera()
        means = jnp.array([[0.0, 0.0, -10.0]])  # behind (camera at z=-4)
        covf = jnp.eye(3)[None] * 0.01
        prep = preprocess(
            means, covf, jnp.ones(1), jnp.ones(1, bool),
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
        )
        assert not bool(prep.valid[0])

    def test_offset_direction(self):
        cam, _, _ = single_camera()
        # +x world -> +x pixels (OpenCV), +y world -> +y pixels (down)
        means = jnp.array([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
        covf = jnp.tile(jnp.eye(3)[None] * 0.01, (2, 1, 1))
        prep = preprocess(
            means, covf, jnp.ones(2), jnp.ones(2, bool),
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
        )
        xy = np.asarray(prep.xy)
        assert xy[0, 0] > 70 and abs(xy[0, 1] - 63.5) < 1.0
        # this camera's CV frame has y_cam = +y world; OpenCV y is down,
        # so +y world lands on a larger pixel row
        assert xy[1, 1] > 70

    def test_radius_scales_with_size(self):
        cam, _, _ = single_camera()
        means = jnp.zeros((2, 3))
        covf = jnp.stack([jnp.eye(3) * 0.01, jnp.eye(3) * 0.1])
        prep = preprocess(
            means, covf, jnp.ones(2), jnp.ones(2, bool),
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
        )
        r = np.asarray(prep.radius)
        # 10x factor => ~10x std, compressed by the +0.3 px dilation floor
        assert r[1] > r[0] * 3

    def test_mark_visible(self):
        cam, _, _ = single_camera()
        means = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -10.0]])
        vis = mark_visible(means, cam.viewmatrix, cam.projmatrix)
        assert bool(vis[0]) and not bool(vis[1])


class TestDenseRender:
    def test_single_gaussian_renders(self):
        cam, wp, hp = single_camera()
        means = jnp.zeros((1, 3))
        covf = jnp.eye(3)[None] * 0.05
        out = render_dense(
            means, covf, jnp.ones(1) * 0.9,
            jnp.array([[1.0, 0.0, 0.0]]), jnp.ones(1, bool),
            cam, wp, hp, chunk=8,
        )
        img = np.asarray(out.image)
        # centre pixel strongly red-dominated vs white background corner
        assert img[64, 64, 0] > 0.95
        assert img[64, 64, 1] < 0.5
        np.testing.assert_allclose(img[0, 0], [1, 1, 1], atol=1e-5)  # white bg
        assert float(out.contrib[0]) > 0.5
        # best colour sampled at argmax pixel = near-centre colour
        assert float(out.best_colour[0, 0]) > 0.9
        # expected depth at centre ~ camera distance * alpha-weight
        assert 2.0 < float(out.depth[64, 64]) <= 4.5

    def test_black_background(self):
        cam, wp, hp = single_camera()
        out = render_dense(
            jnp.zeros((1, 3)), jnp.eye(3)[None] * 0.05, jnp.ones(1),
            jnp.ones((1, 3)), jnp.ones(1, bool), cam, wp, hp,
            chunk=8, white_bkgd=False,
        )
        np.testing.assert_allclose(np.asarray(out.image[0, 0]), [0, 0, 0], atol=1e-6)

    def test_occlusion_order(self):
        cam, wp, hp = single_camera()
        # red gaussian in front (closer to camera at z=-4), green behind
        means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
        covf = jnp.tile(jnp.eye(3)[None] * 0.05, (2, 1, 1))
        cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
        out = render_dense(
            means, covf, jnp.array([0.95, 0.95]), cols, jnp.ones(2, bool),
            cam, wp, hp, chunk=8,
        )
        img = np.asarray(out.image)
        assert img[64, 64, 0] > 3 * img[64, 64, 1]
        # front gaussian has much higher max contribution
        assert float(out.contrib[0]) > 2 * float(out.contrib[1])

    def test_pixel_mask(self):
        cam, wp, hp = single_camera()
        mask = jnp.ones(hp * wp, jnp.uint8).at[: hp * wp // 2].set(0)
        out = render_dense(
            jnp.zeros((1, 3)), jnp.eye(3)[None] * 0.05, jnp.ones(1),
            jnp.ones((1, 3)) * 0.5, jnp.ones(1, bool), cam, wp, hp,
            chunk=8, mask=mask,
        )
        img = np.asarray(out.image).reshape(-1, 3)
        assert (img[: hp * wp // 2] == 0).all()
        assert img[hp * wp // 2 + wp // 2].sum() > 0


def _scene_arrays(n=200, seed=0):
    scene = make_synthetic_scene(n, seed=seed, spread=1.0, scale_lo=-3.5, scale_hi=-1.5)
    return (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities * 0.9,
        scene.colours,
        jnp.ones(n, bool),
    )


class TestTileVsDenseParity:
    @pytest.mark.parametrize("angle", [0.0, 1.1])
    def test_images_match_rect_culled_oracle(self, angle):
        cam, wp, hp = single_camera(angle=angle)
        arrays = _scene_arrays(200)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=64,
            run_cap=256, run_chunk=64, tile_batch=16,
        )
        out_t = render_tile_camera(*arrays, cam, cfg)
        out_d = render_dense(*arrays, cam, wp, hp, chunk=64, rect_cull=True)

        np.testing.assert_allclose(
            np.asarray(out_t.image), np.asarray(out_d.image), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_t.depth), np.asarray(out_d.depth), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_t.contrib), np.asarray(out_d.contrib), atol=2e-4
        )
        # colours at argmax pixels agree where the gaussian was rendered
        seen = np.asarray(out_t.contrib) > 1e-4
        np.testing.assert_allclose(
            np.asarray(out_t.best_colour)[seen],
            np.asarray(out_d.best_colour)[seen],
            atol=5e-3,
        )
        # Surface distances: the tile path's alpha-radius pair culling
        # skips zero-contribution pairs that the CUDA kernel (and the
        # dense oracle's rect emulation) still feeds its surface pass, so
        # tile min-distances may only be >= the oracle's (never smaller),
        # and most Gaussians must agree closely.
        sd_t = np.asarray(out_t.surf_dist)
        sd_d = np.asarray(out_d.surf_dist)
        finite = (sd_t < FLOAT_MAX / 2) & (sd_d < FLOAT_MAX / 2)
        assert finite.sum() > 50
        assert (sd_t[finite] >= sd_d[finite] - 2e-3).all()
        close = np.abs(sd_t[finite] - sd_d[finite]) < 2e-3
        assert close.mean() > 0.8

    def test_close_to_uncolled_oracle(self):
        """Tile rect culling only drops alpha<=opacity*e^-4.5 tails."""
        cam, wp, hp = single_camera()
        arrays = _scene_arrays(150, seed=3)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=64,
            run_cap=256, run_chunk=64, tile_batch=16,
        )
        out_t = render_tile_camera(*arrays, cam, cfg)
        out_d = render_dense(*arrays, cam, wp, hp, chunk=64, rect_cull=False)
        diff = np.abs(np.asarray(out_t.image) - np.asarray(out_d.image))
        assert diff.mean() < 5e-3
        assert diff.max() < 0.1

    def test_mask_parity(self):
        cam, wp, hp = single_camera()
        arrays = _scene_arrays(100, seed=5)
        mask = jnp.ones(hp * wp, jnp.uint8).at[: hp * wp // 3].set(0)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=64,
            run_cap=256, run_chunk=64, tile_batch=16,
        )
        out_t = render_tile_camera(*arrays, cam, cfg, mask=mask)
        out_d = render_dense(*arrays, cam, wp, hp, chunk=64, rect_cull=True, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out_t.image), np.asarray(out_d.image), atol=2e-4
        )

    def test_run_cap_truncation_invisible(self):
        """Dropping the occluded tail beyond run_cap must not change image."""
        cam, wp, hp = single_camera()
        arrays = _scene_arrays(300, seed=7)
        cfg_full = TileConfig(
            width_pad=wp, height_pad=hp, slots=64,
            run_cap=512, run_chunk=64, tile_batch=16,
        )
        cfg_capped = cfg_full._replace(run_cap=256)
        img_full = np.asarray(render_tile_camera(*arrays, cam, cfg_full).image)
        img_capped = np.asarray(render_tile_camera(*arrays, cam, cfg_capped).image)
        # 300 gaussians: some tiles may exceed 256 pairs only if extremely
        # concentrated; either way the visible result should be identical
        # within early-stop tolerance.
        assert np.abs(img_full - img_capped).max() < 5e-3

    def test_jit_and_shapes(self):
        cam, wp, hp = single_camera()
        arrays = _scene_arrays(64, seed=9)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=16,
            run_cap=128, run_chunk=64, tile_batch=16,
        )
        f = jax.jit(lambda *a: render_tile_camera(*a, cam, cfg))
        out = f(*arrays)
        assert out.image.shape == (hp, wp, 3)
        assert out.contrib.shape == (64,)


class TestAntialiasing:
    def test_opacity_rescale(self):
        """antialiasing=True rescales opacity by sqrt(det ratio)
        (forward.cu:217-225); small splats lose opacity, huge ones don't."""
        cam, wp, hp = single_camera()
        means = jnp.zeros((2, 3))
        covf = jnp.stack([jnp.eye(3) * 0.001, jnp.eye(3) * 0.3])
        prep_aa = preprocess(
            means, covf, jnp.ones(2) * 0.8, jnp.ones(2, bool),
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
            antialiasing=True,
        )
        prep_no = preprocess(
            means, covf, jnp.ones(2) * 0.8, jnp.ones(2, bool),
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
            antialiasing=False,
        )
        aa = np.asarray(prep_aa.opacity)
        no = np.asarray(prep_no.opacity)
        assert aa[0] < no[0] * 0.9  # tiny splat: strong attenuation
        assert aa[1] > no[1] * 0.95  # big splat: nearly unchanged
        assert (aa <= no + 1e-6).all()


class TestTinyScene:
    def test_three_gaussian_render(self):
        cam, wp, hp = single_camera()
        means = jnp.array([[0.0, 0, 0], [0.3, 0, 0], [-0.3, 0, 0]])
        covf = jnp.tile(jnp.eye(3)[None] * 0.05, (3, 1, 1))
        cols = jnp.eye(3)
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                         run_cap=128, run_chunk=64, tile_batch=16)
        out = render_tile_camera(
            means, covf, jnp.ones(3) * 0.9, cols, jnp.ones(3, bool), cam, cfg
        )
        assert float(out.contrib.min()) > 0.3
        assert np.asarray(out.image).max() <= 1.0 + 1e-5


def test_large_grid_1080p_geometry():
    """Exercise the 1080p tile grid (120x68 = 8160 tiles): key packing,
    padded tile batches, and windowed builds must hold beyond the small
    test grids."""
    import jax.numpy as jnp

    from gs2pc.ops.rasterize import TileConfig, render_tile_camera
    from tests.conftest import make_synthetic_scene

    scene = make_synthetic_scene(256, seed=51, spread=1.0,
                                 scale_lo=-3.0, scale_hi=-1.5)
    c2w, _ = look_at_camera(angle=0.7, width=1920, height=1080, focal=1500.0)
    from gs2pc.camera import build_camera_batch

    cams, wp, hp = build_camera_batch(
        {"c0": c2w.tolist()}, {"c0": (1920, 1080, 1500.0, 1500.0)}
    )
    cfg = TileConfig(width_pad=wp, height_pad=hp)
    out = render_tile_camera(
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(256, bool), cams.at(0), cfg,
        calc_surface_distance=False,
    )
    img = np.asarray(out.image)
    assert img.shape == (hp, wp, 3)
    assert np.isfinite(img).all()
    # white background everywhere off-splat, some splats rendered
    assert (np.asarray(out.contrib) > 0).sum() > 50


class TestAuxPackedSort:
    def test_production_sort_is_depth_exact_per_tile(self):
        """The production 2-operand sort (packed tile|top-depth key + one
        aux operand packing low depth bits | gid) must order every tile's
        run by EXACT f32 depth with gid breaking exact-depth ties — here
        gid_bits is small, so the aux covers the full depth pattern and
        the order must be perfectly (tile, depth-bits, gid)."""
        from gs2pc.ops.rasterize import _KEY_SENTINEL, _build_pairs

        cam, wp, hp = single_camera(angle=0.7)
        arrays = _scene_arrays(500, seed=21)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, run_cap=256, run_chunk=64,
            tile_batch=16, pair_budget=1 << 20,  # forces the packed path
        )
        means, covf, op, col, alive = arrays
        prep = preprocess(
            means, covf, op, alive, cam.viewmatrix, cam.projmatrix,
            cam.tanfovx, cam.tanfovy, cam.focal_x, cam.focal_y,
            cam.width, cam.height, tile=cfg.tile,
        )
        keys, gid, _ = jax.jit(
            lambda p: _build_pairs(p, cfg)
        )(prep)
        keys = np.asarray(keys)
        gid = np.asarray(gid)
        depth = np.asarray(prep.depth)
        live = keys != _KEY_SENTINEL
        assert live.sum() > 500  # a real expansion happened
        k, g = keys[live], gid[live]
        d = depth[g]
        dbits = d.astype(np.float32).view(np.uint32).astype(np.int64)
        # Lexicographic (tile, depth-bits, gid) must be nondecreasing.
        same_tile = k[1:] == k[:-1]
        assert np.all(k[1:] >= k[:-1])
        assert np.all(~same_tile | (dbits[1:] >= dbits[:-1]))
        tie = same_tile & (dbits[1:] == dbits[:-1])
        assert np.all(~tie | (g[1:] > g[:-1]))
        # One pair per (tile, gaussian): keys are unique within a tile.
        assert np.all(~same_tile | (dbits[1:] != dbits[:-1]) | (g[1:] != g[:-1]))

    def test_full_rect_mode_keeps_every_rect_pair(self):
        """circle_cull=False (surface-distance sweeps) must emit the FULL
        rect pair set — identical pair multiset to circle_cull=True when
        every circle covers its rect (the sentinel-radius case)."""
        from gs2pc.ops.rasterize import _KEY_SENTINEL, _build_pairs

        cam, wp, hp = single_camera(angle=0.3)
        arrays = _scene_arrays(300, seed=5)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, run_cap=256, run_chunk=64,
            tile_batch=16, pair_budget=1 << 20,
        )
        means, covf, op, col, alive = arrays
        prep = preprocess(
            means, covf, op, alive, cam.viewmatrix, cam.projmatrix,
            cam.tanfovx, cam.tanfovy, cam.focal_x, cam.focal_y,
            cam.width, cam.height, tile=cfg.tile,
            adaptive_radius=False,  # full-rect mode: circle never culls
        )
        k_cull, g_cull, _ = jax.jit(
            lambda p: _build_pairs(p, cfg, circle_cull=True)
        )(prep)
        k_skip, g_skip, _ = jax.jit(
            lambda p: _build_pairs(p, cfg, circle_cull=False)
        )(prep)
        np.testing.assert_array_equal(np.asarray(k_cull), np.asarray(k_skip))
        np.testing.assert_array_equal(np.asarray(g_cull), np.asarray(g_skip))


class TestPairQuantum:
    def test_quantized_expansion_matches_q1(self):
        """Window padding (pair_quantum > 1) never changes the LIVE pair
        set when the budget covers the padded coverage — renders must be
        byte-identical to the unpadded expansion."""
        cam, wp, hp = single_camera(angle=0.4)
        arrays = _scene_arrays(400, seed=9)
        base = dict(width_pad=wp, height_pad=hp, run_cap=256,
                    run_chunk=64, tile_batch=16, pair_budget=1 << 20)
        out_q1 = render_tile_camera(
            *arrays, cam, TileConfig(**base, pair_quantum=1)
        )
        for q in (4, 8):
            out_q = render_tile_camera(
                *arrays, cam, TileConfig(**base, pair_quantum=q)
            )
            np.testing.assert_array_equal(
                np.asarray(out_q.image), np.asarray(out_q1.image)
            )
            np.testing.assert_array_equal(
                np.asarray(out_q.contrib), np.asarray(out_q1.contrib)
            )
            np.testing.assert_array_equal(
                np.asarray(out_q.surf_dist), np.asarray(out_q1.surf_dist)
            )
            np.testing.assert_array_equal(
                np.asarray(out_q.best_colour), np.asarray(out_q1.best_colour)
            )

    def test_small_budgets_skip_quantization(self):
        """Budgets under 2^20 keep Q=1 (padding would eat the budget)."""
        cam, wp, hp = single_camera()
        arrays = _scene_arrays(150, seed=3)
        base = dict(width_pad=wp, height_pad=hp, run_cap=256,
                    run_chunk=64, tile_batch=16)
        out_a = render_tile_camera(
            *arrays, cam, TileConfig(**base, pair_quantum=8)
        )
        out_b = render_tile_camera(
            *arrays, cam, TileConfig(**base, pair_quantum=1)
        )
        np.testing.assert_array_equal(
            np.asarray(out_a.image), np.asarray(out_b.image)
        )


class TestPackedArgmax:
    def test_packed_matches_exact_outside_tie_band(self):
        """The production single-scatter argmax (m quantized to 12 bits,
        pixel tiebreak) must report IDENTICAL contributions and pick the
        exact argmax pixel whenever the top-2 pair contributions are
        separated by more than one quantum (1/4096)."""
        from gs2pc.ops.rasterize import _pair_reduce

        r = np.random.default_rng(11)
        L = 1 << 20
        P = 5000
        gid = r.integers(0, P, L).astype(np.int32)
        m = r.uniform(0.0, 0.99, L).astype(np.float32)
        # Zero out a slice so some gaussians have m == 0 paths exercised.
        m[r.uniform(size=L) < 0.05] = 0.0
        apix = r.integers(0, 48 * 48, L).astype(np.int32)
        image = r.uniform(0, 1, (48 * 48, 3)).astype(np.float32)
        img2d = jnp.asarray(image.reshape(48, 48, 3))
        n_occ = jnp.int32(L)

        def run(allow_packed):
            return jax.jit(
                lambda g, mm, a: _pair_reduce(
                    g, mm, a, img2d, P, n_occ, allow_packed=allow_packed
                )
            )(jnp.asarray(gid), jnp.asarray(m), jnp.asarray(apix))

        c_fast, col_fast, pix_fast = run(True)
        c_ex, col_ex, pix_ex = run(False)

        np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_ex))

        # Per-gaussian top-2 separation.
        order = np.lexsort((m, gid))
        gs, ms = gid[order], m[order]
        top1 = np.zeros(P, np.float32)
        top2 = np.zeros(P, np.float32)
        for g, mm in zip(gs, ms):  # sorted ascending per gid
            if mm > top1[g]:
                top2[g] = top1[g]
                top1[g] = mm
            elif mm > top2[g]:
                top2[g] = mm
        clear = (top1 - top2) > (1.5 / 4096.0)
        seen = np.asarray(c_ex) > 0
        sel = clear & seen
        assert sel.sum() > P // 2  # the band is narrow: most are clear
        np.testing.assert_array_equal(
            np.asarray(pix_fast)[sel], np.asarray(pix_ex)[sel]
        )
        np.testing.assert_array_equal(
            np.asarray(col_fast)[sel], np.asarray(col_ex)[sel]
        )

    def test_packed_surface_min_is_exact(self):
        """The packed fast path's surface min — an independent f32
        scatter-min running alongside the uint32 argmax scatter (a fused
        multi-lane row scatter was rejected as ~1.8x slower, see
        _pair_reduce) — must reproduce the exact path's scatter-min,
        including FLOAT_MAX sentinels for never-touched Gaussians."""
        from gs2pc.ops.blend import FLOAT_MAX
        from gs2pc.ops.rasterize import _pair_reduce

        r = np.random.default_rng(7)
        L = 1 << 20
        P = 4096
        gid = r.integers(0, P, L).astype(np.int32)
        gid[gid % 17 == 0] = P  # sentinel dump rows
        m = r.uniform(0.0, 0.99, L).astype(np.float32)
        apix = r.integers(0, 32 * 32, L).astype(np.int32)
        sd = r.uniform(0.0, 5.0, L).astype(np.float32)
        sd[r.uniform(size=L) < 0.02] = FLOAT_MAX
        img2d = jnp.asarray(
            r.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        )

        def run(allow_packed):
            return jax.jit(
                lambda g, mm, a, s: _pair_reduce(
                    g, mm, a, img2d, P, jnp.int32(L), sd_pairs=s,
                    allow_packed=allow_packed,
                )
            )(
                jnp.asarray(gid), jnp.asarray(m), jnp.asarray(apix),
                jnp.asarray(sd),
            )

        c_fast, _, _, s_fast = run(True)
        c_ex, _, _, s_ex = run(False)
        np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_ex))
        np.testing.assert_array_equal(np.asarray(s_fast), np.asarray(s_ex))

        ref = np.full(P + 1, FLOAT_MAX, np.float32)
        np.minimum.at(ref, gid, sd)
        np.testing.assert_array_equal(np.asarray(s_fast), ref[:P])

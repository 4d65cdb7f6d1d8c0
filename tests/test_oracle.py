"""Cross-implementation validation against the INDEPENDENT numpy oracle.

tests/np_oracle.py is written directly from the reference CUDA equations
and shares zero code with gs2pc.ops — these tests break the
tile-vs-dense self-referential parity loop (both production renderers
share ops/blend.py + ops/projection.py, so only an outside oracle can
catch a common-mode bug in the EWA chain or alpha semantics).

Also the giant-splat harness: quantifies the slot-window truncation
error on Gaussians covering 50+ tiles (the background-splat case real
scenes always contain).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gs2pc.camera import build_camera_batch
from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from tests.conftest import make_synthetic_scene
from tests.np_oracle import psnr, render_oracle
from tests.test_render import look_at_camera


def _camera(width=64, height=64, focal=80.0, angle=0.4):
    c2w, intrinsic = look_at_camera(
        angle=angle, width=width, height=height, focal=focal
    )
    cams, wp, hp = build_camera_batch({"c0": c2w.tolist()}, {"c0": intrinsic})
    return cams.at(0), wp, hp


def _oracle_args(scene, cam):
    return dict(
        xyz=np.asarray(scene.xyz),
        log_scales=np.asarray(scene.log_scales),
        quats=np.asarray(scene.rots),
        opacities=np.asarray(scene.opacities),
        colours=np.asarray(scene.colours),
        viewmatrix=np.asarray(cam.viewmatrix),
        projmatrix=np.asarray(cam.projmatrix),
        tanfovx=float(cam.tanfovx),
        tanfovy=float(cam.tanfovy),
        focal_x=float(cam.focal_x),
        focal_y=float(cam.focal_y),
        width=int(cam.width),
        height=int(cam.height),
    )


def _tile_render(scene, cam, wp, hp, mask=None, antialiasing=False, **cfg_kw):
    kw = dict(slots=64, slots_small=64, run_cap=4096, run_chunk=64,
              tile_batch=8)
    kw.update(cfg_kw)
    cfg = TileConfig(width_pad=wp, height_pad=hp, **kw)
    n = scene.num_gaussians
    return render_tile_camera(
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(n, bool), cam, cfg,
        mask=mask, antialiasing=antialiasing, calc_surface_distance=True,
    )


def _dense_render(scene, cam, wp, hp):
    from gs2pc.ops.dense_render import render_dense

    n = scene.num_gaussians
    return render_dense(
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(n, bool), cam, wp, hp, chunk=64,
    )


class TestIndependentOracle:
    @pytest.fixture(scope="class")
    def setup(self):
        scene = make_synthetic_scene(96, seed=21, scale_lo=-3.0, scale_hi=-1.2)
        cam, wp, hp = _camera()
        ref = render_oracle(**_oracle_args(scene, cam))
        return scene, cam, wp, hp, ref

    def test_tile_image_matches(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp)
        img = np.asarray(out.image)[:64, :64]
        p = psnr(img, ref["image"])
        assert p > 50.0, f"tile vs independent oracle PSNR {p:.1f} dB"

    def test_dense_image_matches(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _dense_render(scene, cam, wp, hp)
        img = np.asarray(out.image)[:64, :64]
        p = psnr(img, ref["image"])
        assert p > 50.0, f"dense vs independent oracle PSNR {p:.1f} dB"

    def test_depth_and_invdepth_match(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp)
        np.testing.assert_allclose(
            np.asarray(out.depth)[:64, :64], ref["depth"], atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(out.invdepth)[:64, :64], ref["invdepth"], atol=1e-3
        )

    def test_per_gaussian_contributions_match(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp)
        np.testing.assert_allclose(
            np.asarray(out.contrib), ref["contrib"], atol=2e-3
        )

    def test_best_colours_match(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp)
        seen = ref["contrib"] > 1e-3
        assert seen.sum() > 10
        # Winning-pixel colours; tolerate argmax tie differences by
        # comparing colour values, not pixel ids.
        diff = np.abs(np.asarray(out.best_colour)[seen] - ref["best_colour"][seen])
        assert np.quantile(diff, 0.95) < 2e-2

    def test_surface_distances_match(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp)
        ours = np.asarray(out.surf_dist)
        both = (ours < 1e30) & (ref["surf_dist"] < 1e30)
        assert both.sum() > 10
        np.testing.assert_allclose(
            ours[both], ref["surf_dist"][both], atol=5e-2
        )

    def test_mask_matches(self, setup):
        scene, cam, wp, hp, _ = setup
        mask_img = np.ones((64, 64), np.uint8)
        mask_img[:32, :] = 0  # top half excluded
        ref = render_oracle(**_oracle_args(scene, cam), mask=mask_img)
        mask_pad = np.zeros((hp, wp), np.uint8)
        mask_pad[:64, :64] = mask_img
        out = _tile_render(
            scene, cam, wp, hp, mask=jnp.asarray(mask_pad.reshape(-1))
        )
        p = psnr(np.asarray(out.image)[:64, :64], ref["image"])
        assert p > 50.0
        np.testing.assert_allclose(
            np.asarray(out.contrib), ref["contrib"], atol=2e-3
        )

    def test_antialiasing_matches(self, setup):
        scene, cam, wp, hp, _ = setup
        ref = render_oracle(**_oracle_args(scene, cam), antialiasing=True)
        out = _tile_render(scene, cam, wp, hp, antialiasing=True)
        p = psnr(np.asarray(out.image)[:64, :64], ref["image"])
        assert p > 50.0


class TestGiantSplats:
    """Splats covering 50+ tiles: the slot-window truncation case."""

    @pytest.fixture(scope="class")
    def setup(self):
        import dataclasses

        # A detail scene plus a handful of HUGE background splats behind it
        # (log scale ~ 0 => sigma ~ 1 world unit => hundreds of pixels).
        scene = make_synthetic_scene(64, seed=33, scale_lo=-3.0, scale_hi=-1.5)
        xyz = np.asarray(scene.xyz).copy()
        ls = np.asarray(scene.log_scales).copy()
        op = np.asarray(scene.opacities).copy()
        for i in range(4):
            xyz[i] = [0.3 * i - 0.5, 0.2 * i - 0.3, 2.0 + 0.3 * i]  # behind
            ls[i] = [1.0, 1.0, -2.0]  # sigma ~ 2.7 world units: sky-splat size
            op[i] = 0.8
        scene = dataclasses.replace(
            scene, xyz=jnp.asarray(xyz), log_scales=jnp.asarray(ls),
            opacities=jnp.asarray(op),
        )
        cam, wp, hp = _camera(width=160, height=160, focal=120.0)
        ref = render_oracle(**_oracle_args(scene, cam))
        return scene, cam, wp, hp, ref

    def test_oracle_sees_giant_rects(self, setup):
        scene, cam, wp, hp, ref = setup
        # The big splats must genuinely cover 50+ tiles in the oracle.
        assert (ref["radius"][:4] > 8 * 16).all()

    def test_generous_slots_match_oracle(self, setup):
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp, slots=128, slots_small=128)
        p = psnr(np.asarray(out.image)[:160, :160], ref["image"])
        assert p > 45.0, f"giant-splat scene, full windows: {p:.1f} dB"
        nd = np.asarray(out.n_dropped)
        assert nd[1] == 0  # nothing window-truncated

    def test_default_budget_renders_giants_exactly(self, setup):
        """The waterfilled exact expansion covers the image-filling splats
        within the DEFAULT pair budget — the scenario that broke the old
        per-Gaussian slot windows (round-1 verdict: background splats were
        the likeliest real-scene quality regression)."""
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp, slots=16, slots_small=4)
        nd = np.asarray(out.n_dropped)
        assert nd[1] == 0  # nothing truncated at the default budget
        p = psnr(np.asarray(out.image)[:160, :160], ref["image"])
        assert p > 45.0, f"giant-splat scene, default budget: {p:.1f} dB"

    def test_starved_budget_quantified(self, setup):
        """A deliberately starved --pair_budget must (a) count the dropped
        candidate tiles and (b) degrade boundedly — the graceful-
        degradation contract behind the truncation warning."""
        scene, cam, wp, hp, ref = setup
        out = _tile_render(scene, cam, wp, hp, pair_budget=256)
        nd = np.asarray(out.n_dropped)
        assert nd[1] > 50  # many candidate tiles dropped, and counted
        p = psnr(np.asarray(out.image)[:160, :160], ref["image"])
        # 4 image-filling splats cut to a handful of tiles each hurts
        # badly — that is exactly why the counter and --auto_capacity
        # exist.  Pinned loosely in both directions: a jump ABOVE ~40 dB
        # would mean the fixture stopped exercising truncation.
        assert 5.0 < p < 40.0, f"truncated PSNR {p:.1f} dB"

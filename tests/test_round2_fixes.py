"""Round-2 hardening tests: backend detection, config-file booleans,
checkpoint fingerprints, dense-renderer pixel chunking, sampler bracket."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_synthetic_scene


class TestBackendDetection:
    def test_cpu_is_not_tpu(self):
        from gs2pc.utils.platform import is_tpu_backend

        assert is_tpu_backend() is False

    @pytest.mark.parametrize(
        "platform,kind,expect",
        [
            ("tpu", "TPU v5e", True),
            ("axon", "TPU v5p", True),  # the driver's tunnelled plugin name
            ("weird", "TPU v6", True),  # unknown plugin, self-described TPU
            ("cpu", "cpu", False),
            ("gpu", "NVIDIA A100", False),
        ],
    )
    def test_platform_allowlist(self, monkeypatch, platform, kind, expect):
        from gs2pc.utils import platform as plat_mod

        class FakeDev:
            pass

        dev = FakeDev()
        dev.platform = platform
        dev.device_kind = kind
        monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev])
        assert plat_mod.is_tpu_backend() is expect


class TestConfigFileSemantics:
    def test_value_flag_not_swallowed_as_boolean(self, tmp_path):
        """'pallas = off' is a VALUE, not a boolean skip (round-1 bug)."""
        from gs2pc.utils.config import parse_args

        cfg = tmp_path / "conf.txt"
        cfg.write_text("pallas = off\nshard_axis = gauss\n")
        args = parse_args(
            ["--config", str(cfg), "--input_path", "x.ply", "--no_render_colours"]
        )
        assert args.pallas == "off"
        assert args.shard_axis == "gauss"

    def test_false_overrides_earlier_true(self, tmp_path):
        from gs2pc.utils.config import parse_args

        cfg = tmp_path / "conf.txt"
        cfg.write_text("quiet = true\nquiet = false\n")
        args = parse_args(
            ["--config", str(cfg), "--input_path", "x.ply", "--no_render_colours"]
        )
        assert args.quiet is False

    def test_boolean_words_for_store_true(self, tmp_path):
        from gs2pc.utils.config import parse_args

        cfg = tmp_path / "conf.txt"
        cfg.write_text("exact_num_points = yes\nquiet = no\nclean_pointcloud\n")
        args = parse_args(
            ["--config", str(cfg), "--input_path", "x.ply", "--no_render_colours"]
        )
        assert args.exact_num_points is True
        assert args.quiet is False
        assert args.clean_pointcloud is True

    def test_garbage_boolean_rejected(self, tmp_path):
        from gs2pc.utils.config import parse_args

        cfg = tmp_path / "conf.txt"
        cfg.write_text("quiet = maybe\n")
        with pytest.raises(AttributeError, match="boolean"):
            parse_args(
                ["--config", str(cfg), "--input_path", "x.ply",
                 "--no_render_colours"]
            )

    def test_render_capacity_flags_wired(self):
        from gs2pc.utils.config import parse_args, settings_from_args

        args = parse_args(
            ["--input_path", "x.ply", "--no_render_colours",
             "--tile_slots_small", "8", "--big_window_cap", "512"]
        )
        s = settings_from_args(args)
        assert s.render.slots_small == 8
        assert s.render.big_cap == 512


class TestCheckpointFingerprint:
    def test_same_size_different_scene_rejected(self, tmp_path):
        from gs2pc.parallel.sweep import SweepAccumulators
        from gs2pc.utils.checkpoint import load_accumulators, save_accumulators

        acc = SweepAccumulators(
            jnp.zeros(32), jnp.zeros((32, 3)), jnp.zeros(32), jnp.zeros(32)
        )
        xyz_a = np.arange(96, dtype=np.float32).reshape(32, 3)
        xyz_b = xyz_a + 1.0
        path = str(tmp_path / "acc.npz")
        save_accumulators(path, acc, 32, scene_xyz=xyz_a)
        # Matching scene loads fine.
        load_accumulators(path, 32, scene_xyz=xyz_a)
        with pytest.raises(ValueError, match="different scene"):
            load_accumulators(path, 32, scene_xyz=xyz_b)

    def test_legacy_checkpoint_without_hash_loads(self, tmp_path):
        from gs2pc.parallel.sweep import SweepAccumulators
        from gs2pc.utils.checkpoint import load_accumulators

        path = str(tmp_path / "legacy.npz")
        np.savez_compressed(
            path, version=1, num_gaussians=4,
            max_contribution=np.zeros(4, np.float32),
            colours=np.zeros((4, 3), np.float32),
            total_contribution=np.zeros(4, np.float32),
            min_surface_distance=np.zeros(4, np.float32),
        )
        acc = load_accumulators(path, 4, scene_xyz=np.ones((4, 3), np.float32))
        assert isinstance(acc, SweepAccumulators)


class TestDensePixelChunking:
    def test_chunked_matches_full_image(self):
        from gs2pc.camera import build_camera_batch
        from gs2pc.ops.dense_render import render_dense
        from tests.test_render import look_at_camera

        n = 64
        scene = make_synthetic_scene(n, seed=5, scale_lo=-2.5, scale_hi=-1.0)
        c2w, intrinsic = look_at_camera(angle=0.7, width=48, height=32, focal=50.0)
        cams, wp, hp = build_camera_batch(
            {"c0": c2w.tolist()}, {"c0": intrinsic}
        )
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(n, bool),
        )

        def run(pixel_chunk):
            return render_dense(
                *arrays, cams.at(0), wp, hp,
                chunk=32, pixel_chunk=pixel_chunk,
            )

        full = run(1 << 20)  # one block = whole image
        small = run(256)  # many pixel blocks
        np.testing.assert_allclose(
            np.asarray(full.image), np.asarray(small.image), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(full.depth), np.asarray(small.depth), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(full.contrib), np.asarray(small.contrib), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(full.best_pix or 0), np.asarray(small.best_pix or 0)
        )
        np.testing.assert_allclose(
            np.asarray(full.surf_dist), np.asarray(small.surf_dist),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(full.best_colour), np.asarray(small.best_colour),
            atol=1e-6,
        )


class TestTruncationObservability:
    def _render_acc(self, cfg_kwargs, n=192):
        from gs2pc.camera import build_camera_batch
        from gs2pc.ops.rasterize import TileConfig
        from gs2pc.parallel.sweep import render_sweep
        from tests.test_render import look_at_camera

        # Large splats: rects span many tiles, runs exceed small caps.
        scene = make_synthetic_scene(
            n, seed=3, spread=0.8, scale_lo=-1.2, scale_hi=-0.2
        )
        c2w, intrinsic = look_at_camera(angle=0.3, width=64, height=64, focal=90.0)
        cams, wp, hp = build_camera_batch({"c0": c2w.tolist()}, {"c0": intrinsic})
        cfg = TileConfig(width_pad=wp, height_pad=hp, **cfg_kwargs)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(n, bool),
        )
        return render_sweep(arrays, cams, cfg, calc_surface_distance=False)

    def test_underprovisioned_counters_nonzero(self):
        acc = self._render_acc(
            dict(slots=4, slots_small=2, big_cap=8, run_cap=16,
                 run_chunk=64, tile_batch=8)
        )
        nd = np.asarray(acc.n_dropped)
        assert nd[0] > 0  # pairs blended
        assert nd[1] > 0  # window truncation on the big splats
        assert nd[2] > 0  # run-cap truncation
        assert 0 <= nd[3] <= nd[2]  # live-tile subset of cap drops

    def test_occluded_capdrops_not_live(self):
        """Cap drops behind an opaque front layer don't count as live."""
        import jax

        from gs2pc.camera import build_camera_batch
        from gs2pc.ops.rasterize import TileConfig, render_tile_camera
        from tests.test_render import look_at_camera

        r = np.random.default_rng(7)
        n = 256
        # A dense stack of large opaque splats on one spot: the front few
        # saturate every pixel (T -> 0), the rest are cap-dropped tails.
        xyz = np.zeros((n, 3), np.float32)
        xyz[:, 2] = np.linspace(0.0, 0.5, n)
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        # Large enough that every image pixel sits well inside the core:
        # 32 front pairs drive T below 1/255 everywhere, so the dropped
        # tails are provably invisible.
        scales = np.full((n, 3), 0.5, np.float32)
        cols = r.uniform(0, 1, (n, 3)).astype(np.float32)
        opac = np.full(n, 0.995, np.float32)
        from gs2pc.models.gaussians import Gaussians

        scene = Gaussians.create(xyz, scales, quats, cols, opac)
        c2w, intrinsic = look_at_camera(width=64, height=64, focal=90.0)
        cams, wp, hp = build_camera_batch(
            {"c0": c2w.tolist()}, {"c0": intrinsic}
        )
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=64,
                         slots_small=64, run_cap=32, run_chunk=32,
                         tile_batch=8)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(n, bool),
        )
        out = jax.jit(
            lambda a, c: render_tile_camera(*a, c.at(0), cfg)
        )(arrays, cams)
        nd = np.asarray(out.n_dropped)
        assert nd[2] > 0  # tails were cap-dropped...
        assert nd[3] == 0  # ...but every affected tile was opaque already

    def test_generous_caps_drop_nothing(self):
        acc = self._render_acc(
            dict(slots=64, slots_small=64, run_cap=4096,
                 run_chunk=64, tile_batch=8),
            n=64,
        )
        nd = np.asarray(acc.n_dropped)
        assert nd[0] > 0
        assert nd[1] == 0 and nd[2] == 0

    def test_warning_names_the_flags(self, capsys):
        from gs2pc.parallel.sweep import SweepAccumulators
        from gs2pc.pipeline import report_truncation

        acc = SweepAccumulators(
            jnp.zeros(4), jnp.zeros((4, 3)), jnp.zeros(4), jnp.zeros(4),
            n_dropped=jnp.asarray([1000.0, 100.0, 50.0, 50.0]),
        )
        win_mat, cap_mat = report_truncation(acc)
        assert win_mat and cap_mat
        out = capsys.readouterr().out
        assert "--pair_budget" in out
        assert "--max_pairs_per_tile" in out

    def test_no_warning_below_threshold(self, capsys):
        from gs2pc.parallel.sweep import SweepAccumulators
        from gs2pc.pipeline import report_truncation

        acc = SweepAccumulators(
            jnp.zeros(4), jnp.zeros((4, 3)), jnp.zeros(4), jnp.zeros(4),
            n_dropped=jnp.asarray([1_000_000.0, 10.0, 0.0, 0.0]),
        )
        win_mat, cap_mat = report_truncation(acc)
        assert not win_mat and not cap_mat
        assert "WARNING" not in capsys.readouterr().out

    def test_auto_capacity_escalates(self, tmp_path, capsys):
        """End-to-end: an under-provisioned config with --auto_capacity
        re-renders at doubled capacities."""
        import json as _json

        from gs2pc.io.splat import save_splat
        from gs2pc.pipeline import convert_3dgs_to_pc
        from tests.test_pipeline import small_settings
        from tests.test_render import look_at_camera

        scene = make_synthetic_scene(
            96, seed=7, spread=0.6, scale_lo=-1.0, scale_hi=-0.2
        )
        splat = str(tmp_path / "big.splat")
        save_splat(
            splat, np.asarray(scene.xyz), np.asarray(scene.log_scales),
            np.asarray(scene.rots), np.asarray(scene.colours),
            np.asarray(scene.opacities),
        )
        frames = []
        for i, angle in enumerate([0.0, 2.0]):
            c2w, _ = look_at_camera(angle=angle, width=48, height=48, focal=70.0)
            frames.append({
                "file_path": f"c{i}.png", "transform_matrix": c2w.tolist(),
                "w": 48, "h": 48, "fl_x": 70.0,
            })
        tpath = str(tmp_path / "transforms.json")
        _json.dump({"frames": frames}, open(tpath, "w"))

        from gs2pc.utils.config import RenderConfig

        s = small_settings(
            num_points=2000,
            auto_capacity=True,
            render=RenderConfig(
                slots_per_gaussian=4, slots_small=2, big_cap=8,
                max_pairs_per_tile=64, run_chunk=64, tile_batch=8,
            ),
        )
        convert_3dgs_to_pc(splat, tpath, None, s)
        out = capsys.readouterr().out
        assert "auto_capacity: re-rendering" in out


class TestSamplerBracket:
    def test_huge_std_keeps_absolute_resolution(self):
        """std = 1e8 (effectively untruncated) must still yield exact chi3
        radii, not quantised multi-unit steps (round-1 advisory)."""
        from gs2pc.ops.sampler import _chi3_cdf, _chi3_truncated_radius

        u = jnp.linspace(0.01, 0.99, 257, dtype=jnp.float32)
        r_huge = _chi3_truncated_radius(u, 1e8)
        r_ref = _chi3_truncated_radius(u, 16.0)
        # With the bracket clamp both resolve to the same untruncated
        # quantiles (cdf(16) == 1.0 in f32).
        np.testing.assert_allclose(
            np.asarray(r_huge), np.asarray(r_ref), atol=1e-5
        )
        # Median of chi_3 is ~1.538.
        med = float(r_huge[128])
        assert abs(med - 1.5382) < 1e-2
        # Round-trip through the CDF.
        np.testing.assert_allclose(
            np.asarray(_chi3_cdf(r_huge)), np.asarray(u), atol=1e-4
        )

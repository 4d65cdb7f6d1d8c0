"""Sweep accumulator checkpoint/resume + SH sweep + kNN cull tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs2pc.parallel.sweep import SweepAccumulators
from gs2pc.utils.checkpoint import load_accumulators, save_accumulators
from tests.conftest import make_synthetic_scene


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "sweep.npz")
        acc = SweepAccumulators(
            max_contribution=jnp.asarray(rng.uniform(0, 1, 64), jnp.float32),
            colours=jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32),
            total_contribution=jnp.asarray(rng.uniform(0, 9, 64), jnp.float32),
            min_surface_distance=jnp.asarray(rng.uniform(0, 5, 64), jnp.float32),
        )
        save_accumulators(path, acc, 64)
        acc2 = load_accumulators(path, 64)
        for a, b in zip(acc[:4], acc2[:4]):  # n_dropped is not persisted
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_wrong_size_rejected(self, tmp_path):
        path = str(tmp_path / "sweep.npz")
        acc = SweepAccumulators(
            jnp.zeros(8), jnp.zeros((8, 3)), jnp.zeros(8), jnp.zeros(8)
        )
        save_accumulators(path, acc, 8)
        with pytest.raises(ValueError, match="16"):
            load_accumulators(path, 16)

    def test_pipeline_save_load(self, tmp_path):
        """Full flow: sweep once with save, resume without transforms."""
        import json

        from gs2pc.io.splat import save_splat
        from gs2pc.pipeline import convert_3dgs_to_pc
        from tests.test_pipeline import small_settings
        from tests.test_render import look_at_camera

        scene = make_synthetic_scene(64, seed=13, scale_lo=-3.5, scale_hi=-1.5)
        splat = str(tmp_path / "s.splat")
        save_splat(
            splat, np.asarray(scene.xyz), np.asarray(scene.log_scales),
            np.asarray(scene.rots), np.asarray(scene.colours),
            np.asarray(scene.opacities),
        )
        frames = []
        for i, angle in enumerate([0.0, 2.0]):
            c2w, _ = look_at_camera(angle=angle, width=48, height=48, focal=60.0)
            frames.append({
                "file_path": f"c{i}.png", "transform_matrix": c2w.tolist(),
                "w": 48, "h": 48, "fl_x": 60.0,
            })
        tpath = str(tmp_path / "transforms.json")
        json.dump({"frames": frames}, open(tpath, "w"))

        ckpt = str(tmp_path / "acc.npz")
        s1 = small_settings(num_points=2000, save_sweep=ckpt)
        total1, _ = convert_3dgs_to_pc(splat, tpath, None, s1)

        s2 = small_settings(num_points=2000, load_sweep=ckpt)
        total2, _ = convert_3dgs_to_pc(splat, None, None, s2)
        np.testing.assert_allclose(total1.points, total2.points, atol=1e-6)
        np.testing.assert_allclose(total1.colours, total2.colours, atol=1e-5)


class TestShSweep:
    def test_sh_changes_colours_with_view(self):
        from gs2pc.camera import build_camera_batch
        from gs2pc.ops.rasterize import TileConfig
        from gs2pc.parallel.sweep import render_sweep
        from tests.test_render import look_at_camera

        n = 32
        scene = make_synthetic_scene(n, seed=17, scale_lo=-2.5, scale_hi=-1.5)
        r = np.random.default_rng(1)
        shs = jnp.asarray(r.normal(scale=0.3, size=(n, 3, 16)), jnp.float32)

        transforms, intr = {}, {}
        for i, ang in enumerate([0.0, 3.1]):
            c2w, intrinsic = look_at_camera(angle=ang, width=48, height=48, focal=60.0)
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                         run_cap=128, run_chunk=64, tile_batch=9)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(n, bool),
        )
        acc_sh = render_sweep(arrays, cams, cfg, shs=shs, sh_degree=3)
        acc_dc = render_sweep(arrays, cams, cfg)
        # SH sweeps must produce different (view-dependent) colours
        seen = np.asarray(acc_sh.max_contribution) > 1e-3
        assert seen.sum() > 5
        diff = np.abs(
            np.asarray(acc_sh.colours)[seen] - np.asarray(acc_dc.colours)[seen]
        ).max()
        assert diff > 1e-3


class TestKnnCull:
    def test_outlier_gaussian_culled(self):
        import dataclasses

        scene = make_synthetic_scene(128, seed=19, spread=0.5)
        xyz = np.asarray(scene.xyz).copy()
        xyz[0] = [100.0, 100.0, 100.0]
        scene = dataclasses.replace(scene, xyz=jnp.asarray(xyz))
        g = scene.apply_knn_filter(k=8, max_dist=2.0)
        keep = np.asarray(g.keep_mask)
        assert not keep[0]
        assert keep[1:].mean() > 0.9

"""Multi-device tests on the virtual 8-CPU mesh: sweep and sampler sharding."""

import numpy as np
import jax
import jax.numpy as jnp

from gs2pc.camera import build_camera_batch
from gs2pc.ops.rasterize import TileConfig
from gs2pc.parallel.mesh import CAM_AXIS, make_mesh, points_sharding
from gs2pc.parallel.sweep import (
    pad_cameras,
    render_sweep,
    render_sweep_sharded,
)
from tests.conftest import make_synthetic_scene
from tests.test_render import look_at_camera


def _setup(n_cams=5, n_gauss=96):
    scene = make_synthetic_scene(n_gauss, seed=21, spread=1.0,
                                 scale_lo=-3.5, scale_hi=-1.5)
    transforms, intr = {}, {}
    for i in range(n_cams):
        c2w, intrinsic = look_at_camera(angle=i * 1.1, width=48, height=48, focal=60.0)
        transforms[f"c{i}"] = c2w.tolist()
        intr[f"c{i}"] = intrinsic
    cams, wp, hp = build_camera_batch(transforms, intr)
    arrays = (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities * 0.9,
        scene.colours,
        jnp.ones(n_gauss, bool),
    )
    cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                     run_cap=128, run_chunk=64, tile_batch=9)
    return arrays, cams, cfg


class TestShardedSweep:
    def test_matches_single_device(self):
        assert len(jax.devices()) == 8
        arrays, cams, cfg = _setup()
        acc_seq = jax.jit(
            lambda a, c: render_sweep(a, c, cfg)
        )(arrays, cams)
        mesh = make_mesh(4)
        acc_sh = render_sweep_sharded(arrays, cams, cfg, mesh)

        np.testing.assert_allclose(
            np.asarray(acc_sh.max_contribution),
            np.asarray(acc_seq.max_contribution),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(acc_sh.total_contribution),
            np.asarray(acc_seq.total_contribution),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(acc_sh.min_surface_distance),
            np.asarray(acc_seq.min_surface_distance),
            atol=1e-4,
        )
        # colours: winner may differ only on exact contribution ties
        gm = np.asarray(acc_seq.max_contribution)
        np.testing.assert_allclose(
            np.asarray(acc_sh.colours)[gm > 1e-4],
            np.asarray(acc_seq.colours)[gm > 1e-4],
            atol=1e-4,
        )

    def test_pallas_sharded_matches_xla(self):
        """shard_map over cameras composes with the Pallas blend kernel
        (interpret mode on the CPU mesh) and matches the XLA path."""
        arrays, cams, cfg = _setup()
        acc_seq = jax.jit(lambda a, c: render_sweep(a, c, cfg))(arrays, cams)
        mesh = make_mesh(4)
        acc_sh = render_sweep_sharded(arrays, cams, cfg, mesh, use_pallas=True)
        np.testing.assert_allclose(
            np.asarray(acc_sh.max_contribution),
            np.asarray(acc_seq.max_contribution),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(
                np.minimum(acc_sh.min_surface_distance, 1e6)
            ),
            np.asarray(np.minimum(acc_seq.min_surface_distance, 1e6)),
            atol=1e-5,
        )

    def test_pad_cameras_inert(self):
        arrays, cams, cfg = _setup(n_cams=3)
        padded = pad_cameras(cams, 8)
        assert padded.num_cameras == 8
        acc_pad = jax.jit(lambda a, c: render_sweep(a, c, cfg))(arrays, padded)
        acc_orig = jax.jit(lambda a, c: render_sweep(a, c, cfg))(arrays, cams)
        np.testing.assert_allclose(
            np.asarray(acc_pad.total_contribution),
            np.asarray(acc_orig.total_contribution),
            atol=1e-6,
        )


class TestShardedPipeline:
    def test_convert_with_num_devices(self, tmp_path):
        """convert_3dgs_to_pc with a 4-device camera mesh matches 1-device."""
        import json

        from gs2pc.io.splat import save_splat
        from gs2pc.pipeline import convert_3dgs_to_pc
        from tests.test_pipeline import small_settings
        from tests.test_render import look_at_camera

        scene = make_synthetic_scene(64, seed=23, scale_lo=-3.5, scale_hi=-1.5)
        splat = str(tmp_path / "s.splat")
        save_splat(
            splat, np.asarray(scene.xyz), np.asarray(scene.log_scales),
            np.asarray(scene.rots), np.asarray(scene.colours),
            np.asarray(scene.opacities),
        )
        frames = []
        for i in range(5):
            c2w, _ = look_at_camera(angle=i * 1.2, width=48, height=48, focal=60.0)
            frames.append({
                "file_path": f"c{i}.png", "transform_matrix": c2w.tolist(),
                "w": 48, "h": 48, "fl_x": 60.0,
            })
        tpath = str(tmp_path / "transforms.json")
        json.dump({"frames": frames}, open(tpath, "w"))

        settings = small_settings(num_points=3000)
        total1, _ = convert_3dgs_to_pc(splat, tpath, None, settings)
        total4, _ = convert_3dgs_to_pc(
            splat, tpath, None, settings, num_devices=4
        )
        assert abs(total1.points.shape[0] - total4.points.shape[0]) < 50
        np.testing.assert_allclose(
            total1.colours.mean(axis=0), total4.colours.mean(axis=0), atol=1.0
        )


class TestSamplerSharding:
    def test_points_sharded(self):
        from gs2pc.ops.sampler import sample_points

        scene = make_synthetic_scene(64, seed=2)
        ppg = jnp.full(64, 128, jnp.int32)
        mesh = make_mesh(8)
        shard = points_sharding(mesh)

        def f(key):
            out = sample_points(key, scene, ppg, n_cap=8192)
            return jax.lax.with_sharding_constraint(out.points, shard), out.valid

        pts, valid = jax.jit(f)(jax.random.PRNGKey(0))
        assert pts.sharding.is_equivalent_to(shard, pts.ndim)
        assert int(np.asarray(valid).sum()) > 7000


class TestGaussShardedSweep:
    """Depth-slab Gaussian-axis sharding (parallel/gauss_shard.py) must
    match the single-device sweep: the alpha-compositing decomposition
    (C1,T1)⊕(C2,T2)=(C1+T1·C2, T1·T2) is exact when no big-cap overflow
    truncation differs, so tolerances here are f32-summation-order only
    (colour gets slack for argmax-pixel ties at equal contributions)."""

    def _setup(self):
        scene = make_synthetic_scene(400, seed=31, spread=1.1,
                                     scale_lo=-3.2, scale_hi=-1.4)
        transforms, intr = {}, {}
        for i in range(3):
            c2w, intrinsic = look_at_camera(
                angle=i * 1.7, width=64, height=48, focal=70.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        arrays = (
            scene.xyz,
            scene.covariance_factors(),
            scene.opacities * 0.9,
            scene.colours,
            jnp.ones(400, bool),
        )
        # big_cap = P: no overflow, so the decomposition is exact.
        cfg = TileConfig(width_pad=wp, height_pad=hp, big_cap=400)
        return arrays, cams, cfg

    def test_matches_single_device(self):
        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
        )

        arrays, cams, cfg = self._setup()
        acc1 = render_sweep(arrays, cams, cfg, calc_surface_distance=True)
        accN = render_sweep_gauss_sharded(
            arrays, cams, cfg, make_gauss_mesh(8),
            calc_surface_distance=True,
        )
        np.testing.assert_allclose(
            np.asarray(accN.max_contribution),
            np.asarray(acc1.max_contribution), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(accN.total_contribution),
            np.asarray(acc1.total_contribution), atol=1e-5,
        )
        a = np.asarray(acc1.min_surface_distance)
        b = np.asarray(accN.min_surface_distance)
        finite = (a < 3e38) & (b < 3e38)
        assert (finite == ((a < 3e38) | (b < 3e38))).all()
        np.testing.assert_allclose(b[finite], a[finite], atol=1e-4)
        # colour: argmax-pixel ties at equal contribution may pick a
        # different (equally valid) pixel; bound the fraction affected.
        dc = np.abs(np.asarray(accN.colours) - np.asarray(acc1.colours))
        assert (dc.max(axis=1) < 1e-3).mean() > 0.97
        assert dc.max() < 0.2

    def test_pipeline_gauss_axis(self, tmp_path):
        """convert_3dgs_to_pc with --shard_axis gauss matches 1-device."""
        import json

        from gs2pc.io.splat import save_splat
        from gs2pc.pipeline import convert_3dgs_to_pc
        from gs2pc.utils.config import GaussPointCloudSettings, RenderConfig

        scene = make_synthetic_scene(300, seed=32, spread=1.0,
                                     scale_lo=-3.4, scale_hi=-1.6)
        splat = str(tmp_path / "s.splat")
        save_splat(splat, np.asarray(scene.xyz),
                   np.asarray(scene.log_scales), np.asarray(scene.rots),
                   np.asarray(scene.colours), np.asarray(scene.opacities))
        frames = []
        for i in range(3):
            c2w, _ = look_at_camera(angle=i * 2.0, width=64, height=48,
                                    focal=70.0)
            frames.append({
                "file_path": f"images/c{i}.png",
                "transform_matrix": c2w.tolist(),
                "w": 64, "h": 48, "fl_x": 70.0, "fl_y": 70.0,
            })
        tpath = str(tmp_path / "transforms.json")
        json.dump({"frames": frames}, open(tpath, "w"))

        settings = GaussPointCloudSettings(
            num_points=5000, quiet=True, colour_resolution=None,
            render=RenderConfig(use_pallas="off"),
        )
        total1, _ = convert_3dgs_to_pc(splat, tpath, None, settings)
        totalG, _ = convert_3dgs_to_pc(
            splat, tpath, None,
            settings._replace(shard_axis="gauss"), num_devices=4,
        )
        assert total1.points.shape[0] > 0
        # point sets match (same seed; colours may differ on tie pixels)
        np.testing.assert_allclose(
            totalG.points, total1.points, atol=1e-4,
        )


class Test2DMeshSweep:
    def test_matches_single_device(self):
        from gs2pc.parallel.gauss_shard import make_2d_mesh, render_sweep_2d

        scene = make_synthetic_scene(400, seed=31, spread=1.1,
                                     scale_lo=-3.2, scale_hi=-1.4)
        transforms, intr = {}, {}
        for i in range(3):
            c2w, intrinsic = look_at_camera(
                angle=i * 1.7, width=64, height=48, focal=70.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities * 0.9,
            scene.colours, jnp.ones(400, bool),
        )
        cfg = TileConfig(width_pad=wp, height_pad=hp, big_cap=400)

        mesh = make_2d_mesh(8)
        assert dict(mesh.shape) == {"cams": 2, "gauss": 4}
        acc1 = render_sweep(arrays, cams, cfg, calc_surface_distance=True)
        accN = render_sweep_2d(
            arrays, cams, cfg, mesh, calc_surface_distance=True
        )
        np.testing.assert_allclose(
            np.asarray(accN.max_contribution),
            np.asarray(acc1.max_contribution), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(accN.total_contribution),
            np.asarray(acc1.total_contribution), atol=1e-5,
        )
        a = np.asarray(acc1.min_surface_distance)
        b = np.asarray(accN.min_surface_distance)
        finite = (a < 3e38) & (b < 3e38)
        np.testing.assert_allclose(b[finite], a[finite], atol=1e-4)
        dc = np.abs(np.asarray(accN.colours) - np.asarray(acc1.colours))
        assert (dc.max(axis=1) < 1e-3).mean() > 0.97


class TestGaussShardMasks:
    def test_mask_interaction_matches_single_device(self):
        """Pixel masks must compose with the slab decomposition: masked
        pixels are invalid in every slab and report neutral T=1."""
        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
        )

        scene = make_synthetic_scene(200, seed=41, spread=1.0,
                                     scale_lo=-3.2, scale_hi=-1.6)
        transforms, intr = {}, {}
        for i in range(2):
            c2w, intrinsic = look_at_camera(
                angle=i * 2.1, width=48, height=48, focal=55.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        rng = np.random.default_rng(0)
        masks = {
            f"c{i}": (rng.uniform(size=(48, 48)) > 0.4).astype(np.uint8)
            for i in range(2)
        }
        cams, wp, hp = build_camera_batch(transforms, intr, masks=masks)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities * 0.9,
            scene.colours, jnp.ones(200, bool),
        )
        cfg = TileConfig(width_pad=wp, height_pad=hp, big_cap=200)
        acc1 = render_sweep(arrays, cams, cfg, calc_surface_distance=True)
        accN = render_sweep_gauss_sharded(
            arrays, cams, cfg, make_gauss_mesh(8),
            calc_surface_distance=True,
        )
        np.testing.assert_allclose(
            np.asarray(accN.max_contribution),
            np.asarray(acc1.max_contribution), atol=1e-5,
        )
        a = np.asarray(acc1.min_surface_distance)
        b = np.asarray(accN.min_surface_distance)
        finite = (a < 3e38) & (b < 3e38)
        assert (finite == ((a < 3e38) | (b < 3e38))).all()
        np.testing.assert_allclose(b[finite], a[finite], atol=1e-4)


class TestGaussShardPallas:
    """--shard_axis gauss composed with the Pallas blend (interpret mode
    on the CPU mesh) must match the XLA-blend sharded sweep."""

    def test_gauss_shard_with_pallas_matches(self):
        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
        )

        scene = make_synthetic_scene(160, seed=41, spread=1.0,
                                     scale_lo=-3.2, scale_hi=-1.5)
        transforms, intr = {}, {}
        for i in range(2):
            c2w, intrinsic = look_at_camera(
                angle=i * 2.1, width=48, height=32, focal=60.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities * 0.9,
            scene.colours, jnp.ones(160, bool),
        )
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=32,
                         big_cap=160, run_cap=256, run_chunk=128,
                         tile_batch=6)
        mesh = make_gauss_mesh(4)
        acc_x = render_sweep_gauss_sharded(
            arrays, cams, cfg, mesh, calc_surface_distance=True,
        )
        acc_p = render_sweep_gauss_sharded(
            arrays, cams, cfg, mesh, calc_surface_distance=True,
            use_pallas=True,
        )
        np.testing.assert_allclose(
            np.asarray(acc_p.max_contribution),
            np.asarray(acc_x.max_contribution), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(acc_p.total_contribution),
            np.asarray(acc_x.total_contribution), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(acc_p.colours), np.asarray(acc_x.colours), atol=1e-4,
        )
        sx = np.minimum(np.asarray(acc_x.min_surface_distance), 1e6)
        sp = np.minimum(np.asarray(acc_p.min_surface_distance), 1e6)
        np.testing.assert_allclose(sp, sx, atol=1e-4)

    def test_gauss_shard_sh_colour_eval(self):
        """--shard_axis gauss now supports per-camera SH colours."""
        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
        )

        n = 96
        scene = make_synthetic_scene(n, seed=43, scale_lo=-2.5, scale_hi=-1.5)
        r = np.random.default_rng(2)
        shs = jnp.asarray(r.normal(scale=0.3, size=(n, 3, 16)), jnp.float32)
        transforms, intr = {}, {}
        for i, ang in enumerate([0.0, 3.1]):
            c2w, intrinsic = look_at_camera(angle=ang, width=48, height=48,
                                            focal=60.0)
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                         big_cap=n, run_cap=128, run_chunk=64, tile_batch=9)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(n, bool),
        )
        acc_sh_1dev = render_sweep(arrays, cams, cfg, shs=shs, sh_degree=3)
        acc_sh_shard = render_sweep_gauss_sharded(
            arrays, cams, cfg, make_gauss_mesh(4), shs=shs, sh_degree=3,
        )
        np.testing.assert_allclose(
            np.asarray(acc_sh_shard.max_contribution),
            np.asarray(acc_sh_1dev.max_contribution), atol=1e-5,
        )
        dc = np.abs(
            np.asarray(acc_sh_shard.colours) - np.asarray(acc_sh_1dev.colours)
        )
        assert (dc.max(axis=1) < 1e-3).mean() > 0.95


class TestSlabCompaction:
    """v2 gauss-shard: each device compacts its depth slab to a
    ~1.25 P/D buffer before preprocessing, so the per-device pair sort
    is ~L/D instead of replicated at L."""

    def test_capacity_scales_inverse_d(self):
        from gs2pc.parallel.gauss_shard import slab_capacity

        p = 1_000_000
        for dcount in (2, 4, 8, 64):
            cap = slab_capacity(p, dcount)
            assert cap >= p // dcount  # never below the mean population
            assert cap <= int(p / dcount * 1.25) + 512  # ~1/D scaling
        assert slab_capacity(100, 1) == 100  # capped at P

    def test_compacted_parity_with_single_device(self):
        """P large enough that P_slab < P (real compaction) still matches
        the single-device sweep."""
        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
            slab_capacity,
        )

        n = 3000
        assert slab_capacity(n, 4) < n  # the test exercises compaction
        scene = make_synthetic_scene(n, seed=51, spread=1.2,
                                     scale_lo=-3.5, scale_hi=-2.0)
        transforms, intr = {}, {}
        for i in range(2):
            c2w, intrinsic = look_at_camera(
                angle=i * 2.4, width=48, height=32, focal=55.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities * 0.9,
            scene.colours, jnp.ones(n, bool),
        )
        # run_cap 8192 >> any tile's run here: the test isolates the
        # compaction machinery from the (separately documented) per-slab
        # cap divergence.
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                         big_cap=n, run_cap=8192, run_chunk=128,
                         tile_batch=6)
        acc1 = render_sweep(arrays, cams, cfg, calc_surface_distance=True)
        accN = render_sweep_gauss_sharded(
            arrays, cams, cfg, make_gauss_mesh(4),
            calc_surface_distance=True,
        )
        # atol 1e-3: this scene saturates run_cap on a few tiles, where
        # the per-SLAB cap blends slightly more pairs than one device
        # (documented divergence (b) in gauss_shard.py).
        np.testing.assert_allclose(
            np.asarray(accN.max_contribution),
            np.asarray(acc1.max_contribution), atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(accN.total_contribution),
            np.asarray(acc1.total_contribution), atol=1e-3, rtol=2e-2,
        )
        a = np.asarray(acc1.min_surface_distance)
        b = np.asarray(accN.min_surface_distance)
        finite = (a < 3e38) & (b < 3e38)
        np.testing.assert_allclose(b[finite], a[finite], atol=1e-3)
        dc = np.abs(np.asarray(accN.colours) - np.asarray(acc1.colours))
        assert (dc.max(axis=1) < 1e-3).mean() > 0.97
        # No slab overflow on a quantile-balanced scene.
        nd1 = np.asarray(acc1.n_dropped)
        ndN = np.asarray(accN.n_dropped)
        assert ndN[1] == nd1[1]

    def test_overflow_counted_on_tied_depths(self):
        """All Gaussians at one depth land in one slab (ties never split);
        the slab buffer overflows and the drop is counted."""
        import dataclasses

        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
            slab_capacity,
        )

        n = 3000
        scene = make_synthetic_scene(n, seed=53, spread=1.0,
                                     scale_lo=-3.5, scale_hi=-2.5)
        xyz = np.asarray(scene.xyz).copy()
        xyz[:, 2] = 0.0  # a single depth plane for the axis-aligned camera
        scene = dataclasses.replace(scene, xyz=jnp.asarray(xyz))
        c2w, intrinsic = look_at_camera(angle=0.0, width=48, height=32,
                                        focal=55.0)
        cams, wp, hp = build_camera_batch(
            {"c0": c2w.tolist()}, {"c0": intrinsic}
        )
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(n, bool),
        )
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=8,
                         big_cap=n, run_cap=512, run_chunk=128,
                         tile_batch=6)
        acc = render_sweep_gauss_sharded(
            arrays, cams, cfg, make_gauss_mesh(4),
            calc_surface_distance=False,
        )
        nd = np.asarray(acc.n_dropped)
        # One slab holds ~all n; capacity is ~1.25 n/4.
        assert nd[1] >= n - slab_capacity(n, 4)


class TestPerSlabCapDivergence:
    """Divergence (b) in gauss_shard.py: a tile that saturates run_cap
    blends up to D x run_cap pairs across slabs — strictly MORE of the
    scene than one device keeps.  This pins the magnitude on a scene
    that actually saturates the cap (round-1 review asked for exactly
    this: today's parity tests used caps the scenes never hit)."""

    def test_divergence_bounded_and_direction_correct(self):
        from gs2pc.parallel.gauss_shard import (
            make_gauss_mesh,
            render_sweep_gauss_sharded,
        )

        n = 3000
        scene = make_synthetic_scene(n, seed=61, spread=1.2,
                                     scale_lo=-3.5, scale_hi=-2.0)
        c2w, intrinsic = look_at_camera(angle=0.9, width=48, height=32,
                                        focal=55.0)
        cams, wp, hp = build_camera_batch(
            {"c0": c2w.tolist()}, {"c0": intrinsic}
        )
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities * 0.9,
            scene.colours, jnp.ones(n, bool),
        )
        # 6 tiles, ~3000 Gaussians: run_cap 512 saturates hard.
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                         big_cap=n, run_cap=512, run_chunk=128,
                         tile_batch=6)
        acc1 = render_sweep(arrays, cams, cfg, calc_surface_distance=False)
        accN = render_sweep_gauss_sharded(
            arrays, cams, cfg, make_gauss_mesh(4),
            calc_surface_distance=False,
        )
        nd1 = np.asarray(acc1.n_dropped)
        ndN = np.asarray(accN.n_dropped)
        assert nd1[2] > 0  # the scene genuinely saturates the cap
        # Per-slab caps keep MORE pairs: fewer run-cap drops, more blended.
        assert ndN[2] < nd1[2]
        assert ndN[0] > nd1[0]
        # Magnitude of the contribution divergence stays bounded: the
        # extra pairs sit deep in the depth order where T is tiny.
        d = np.abs(
            np.asarray(accN.max_contribution)
            - np.asarray(acc1.max_contribution)
        )
        assert d.max() < 0.05, f"cap divergence {d.max():.4f}"
        assert (d > 1e-6).any()  # ...but is genuinely nonzero when saturated

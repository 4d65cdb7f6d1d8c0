"""Tests for budget distribution and the flat fixed-shape sampler."""

import numpy as np
import jax
import jax.numpy as jnp

from gs2pc.ops.binning import calculate_bin_sizes
from gs2pc.ops.sampler import (
    distribute_points,
    generate_pointcloud,
    mahalanobis,
    sample_points,
)
from tests.conftest import make_synthetic_scene


class TestDistributePoints:
    def test_total_close_to_budget(self, rng):
        sizes = jnp.asarray(rng.uniform(0.1, 10.0, 1000), jnp.float32)
        ppg = distribute_points(sizes, 100_000)
        total = int(ppg.sum())
        assert abs(total - 100_000) <= 1000
        assert int(ppg.min()) >= 0

    def test_zero_promotion(self):
        # Three equal Gaussians round 3.33->3 leaving deficit 1; exactly one
        # zero-quota Gaussian (the first, in index order) gets promoted.
        sizes = jnp.asarray([3.0, 3.0, 3.0] + [1e-5] * 5, jnp.float32)
        ppg = np.asarray(distribute_points(sizes, 10))
        assert list(ppg[:3]) == [3, 3, 3]
        assert ppg[3] == 1 and (ppg[4:] == 0).all()

    def test_zero_promotion_clamped_on_overshoot(self):
        # Rounding overshoot (negative deficit) must not promote anything.
        sizes = jnp.asarray([1.6, 1.6, 1.6] + [1e-5] * 4, jnp.float32)
        ppg = np.asarray(distribute_points(sizes, 5))
        assert (ppg[3:] == 0).all()

    def test_proportionality(self):
        sizes = jnp.asarray([1.0, 2.0, 4.0], jnp.float32)
        ppg = np.asarray(distribute_points(sizes, 7000))
        np.testing.assert_allclose(ppg, [1000, 2000, 4000], atol=1.0)


class TestSamplePoints:
    def test_quota_and_centres(self):
        scene = make_synthetic_scene(64, seed=1)
        ppg = jnp.full(64, 10, jnp.int32)
        out = sample_points(
            jax.random.PRNGKey(0), scene, ppg, n_cap=800, num_attempts=100
        )
        v = np.asarray(out.valid)
        gi = np.asarray(out.gaussian_idx)
        assert int(out.total) == 640
        # exact-mode attempts -> essentially all points accepted
        counts = np.bincount(gi[v], minlength=64)
        assert (counts == 10).all()
        # first point of each gaussian is its exact centre
        pts = np.asarray(out.points)
        starts = np.arange(64) * 10
        np.testing.assert_allclose(pts[starts], np.asarray(scene.xyz), atol=1e-6)

    def test_mahalanobis_bound(self):
        scene = make_synthetic_scene(32, seed=2)
        ppg = jnp.full(32, 50, jnp.int32)
        std = 1.5
        out = sample_points(
            jax.random.PRNGKey(3), scene, ppg, n_cap=1600,
            mahalanobis_std=std, num_attempts=100,
        )
        pts = np.asarray(out.points)
        v = np.asarray(out.valid)
        gi = np.asarray(out.gaussian_idx)
        covs = np.asarray(scene.covariances())
        d = np.asarray(
            mahalanobis(
                scene.xyz[jnp.asarray(gi)],
                jnp.asarray(pts),
                jnp.asarray(covs)[jnp.asarray(gi)],
            )
        )
        assert (d[v] <= std + 1e-2).all()

    def test_distribution_matches_gaussian(self):
        # Single isotropic gaussian, many samples: sample covariance should
        # approximate the truncated normal's (smaller than full normal's).
        from gs2pc.models.gaussians import Gaussians

        sigma = 0.3
        g = Gaussians.create(
            np.zeros((1, 3)),
            np.full((1, 3), np.log(sigma)),
            np.array([[1.0, 0, 0, 0]]),
            np.ones((1, 3)) * 0.5,
            np.ones(1),
        )
        n = 20000
        out = sample_points(
            jax.random.PRNGKey(7), g, jnp.asarray([n], jnp.int32),
            n_cap=n, mahalanobis_std=3.0, num_attempts=100,
        )
        pts = np.asarray(out.points)[np.asarray(out.valid)]
        assert abs(pts.mean()) < 0.01
        # std of 3-sigma-truncated normal ~ 0.973 * sigma
        assert abs(pts.std() - 0.973 * sigma) < 0.02

    def test_capacity_truncation(self):
        scene = make_synthetic_scene(16, seed=4)
        ppg = jnp.full(16, 100, jnp.int32)
        out = sample_points(jax.random.PRNGKey(0), scene, ppg, n_cap=500)
        assert int(out.total) == 1600
        assert np.asarray(out.valid).sum() <= 500

    def test_jit_compatible(self):
        scene = make_synthetic_scene(32, seed=5)
        ppg = jnp.full(32, 8, jnp.int32)
        f = jax.jit(lambda k: sample_points(k, scene, ppg, n_cap=256))
        out = f(jax.random.PRNGKey(0))
        assert out.points.shape == (256, 3)


class TestGeneratePointcloud:
    def test_end_to_end_budget(self):
        scene = make_synthetic_scene(200, seed=6).calculate_normals()
        out = generate_pointcloud(
            jax.random.PRNGKey(0), scene, 50_000, exact_num_points=True
        )
        nvalid = int(np.asarray(out.valid).sum())
        assert abs(nvalid - 50_000) / 50_000 < 0.02
        assert out.normals is not None

    def test_contributions_bias(self):
        scene = make_synthetic_scene(100, seed=8)
        contrib = jnp.zeros(100).at[0].set(100.0).at[1:].set(0.01)
        out = generate_pointcloud(
            jax.random.PRNGKey(0), scene, 10_000, contributions=contrib
        )
        gi = np.asarray(out.gaussian_idx)[np.asarray(out.valid)]
        assert (gi == 0).mean() > 0.5


class TestBinning:
    def test_reference_shape(self, rng):
        ppg = rng.integers(0, 500, 20000)
        start_bin, bin_size = calculate_bin_sizes(ppg)
        assert start_bin >= 0 and bin_size >= 1

    def test_small_input(self):
        assert calculate_bin_sizes(np.array([1, 1, 2])) == (1, 1)


class TestExactTruncatedSampling:
    """The rejection loop was replaced by exact inverse-CDF sampling; pin
    (a) the radial law against the analytic truncated chi_3 CDF and
    (b) the zero-rejection guarantee (every in-budget quota is met)."""

    def test_radial_distribution_matches_truncated_chi3(self):
        from gs2pc.ops.sampler import _chi3_cdf

        std = 2.0
        scene = make_synthetic_scene(
            1, seed=0, scale_lo=0.0, scale_hi=0.0
        )  # exp(0) = identity scales: z radius == point radius
        n = 40_000
        ppg = jnp.full(1, n + 1, jnp.int32)
        out = sample_points(
            jax.random.PRNGKey(3), scene, ppg, n_cap=n + 1,
            mahalanobis_std=std,
        )
        pts = np.asarray(out.points)[np.asarray(out.valid)]
        centre = np.asarray(scene.xyz)[0]
        # rotation preserves radius; drop the centre point itself
        rad = np.linalg.norm(pts - centre, axis=1)
        rad = np.sort(rad[rad > 0])
        assert rad.max() <= std * 1.0001
        # empirical CDF vs analytic truncated chi3 (Kolmogorov distance)
        analytic = np.asarray(
            _chi3_cdf(jnp.asarray(rad, jnp.float32))
        ) / float(_chi3_cdf(jnp.float32(std)))
        emp = (np.arange(len(rad)) + 0.5) / len(rad)
        ks = np.abs(analytic - emp).max()
        assert ks < 0.02, f"KS distance {ks}"

    def test_no_rejections_quotas_exact(self):
        scene = make_synthetic_scene(64, seed=4)
        ppg = jnp.asarray(
            np.random.default_rng(0).integers(0, 40, 64), jnp.int32
        )
        total = int(ppg.sum())
        out = sample_points(
            jax.random.PRNGKey(1), scene, ppg, n_cap=total + 8,
        )
        assert int(np.asarray(out.valid).sum()) == total
        counts = np.bincount(
            np.asarray(out.gaussian_idx)[np.asarray(out.valid)], minlength=64
        )
        assert (counts == np.asarray(ppg)).all()

"""Unit tests: quaternions, closed-form eig3, SH, Gaussians scene ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs2pc.models.gaussians import Gaussians
from gs2pc.ops.eig3 import eigvals_sym3
from gs2pc.ops.quaternion import normalize, quat_to_rotmat
from gs2pc.ops.sh import SH_C0, eval_sh, sh_dc_to_rgb
from gs2pc.ops.covariance import (
    non_posdef_mask,
    validate_covariance_matrices,
)


class TestQuaternion:
    def test_identity(self):
        R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_orthonormal(self, rng):
        q = normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
        R = quat_to_rotmat(q)
        RtR = jnp.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, np.ones(64), atol=1e-5)

    def test_z_rotation(self):
        # 90 deg about z: w = cos(45), z = sin(45)
        c = np.cos(np.pi / 4).astype(np.float32)
        R = quat_to_rotmat(jnp.array([c, 0.0, 0.0, c]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)


class TestEig3:
    def test_matches_numpy(self, rng):
        A = rng.normal(size=(128, 3, 3)).astype(np.float32)
        S = A @ np.transpose(A, (0, 2, 1))
        ours = np.asarray(eigvals_sym3(jnp.asarray(S)))
        ref = np.linalg.eigvalsh(S)
        scale = np.abs(ref).max(axis=-1, keepdims=True)
        np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-5)

    def test_degenerate(self):
        S = jnp.zeros((2, 3, 3)).at[0].set(jnp.eye(3))
        vals = np.asarray(eigvals_sym3(S))
        np.testing.assert_allclose(vals[0], [1, 1, 1], atol=1e-6)
        np.testing.assert_allclose(vals[1], [0, 0, 0], atol=1e-6)


class TestSH:
    def test_dc_roundtrip(self, rng):
        rgb = rng.uniform(0.2, 0.8, (16, 3)).astype(np.float32)
        sh = (rgb - 0.5) / SH_C0
        np.testing.assert_allclose(sh_dc_to_rgb(jnp.asarray(sh)), rgb, atol=1e-6)

    def test_deg0_constant_in_direction(self, rng):
        sh = jnp.asarray(rng.normal(size=(8, 3, 1)), jnp.float32)
        out = eval_sh(0, sh)
        np.testing.assert_allclose(out, SH_C0 * sh[..., 0], atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_higher_degrees_run(self, rng, deg):
        k = (deg + 1) ** 2
        sh = jnp.asarray(rng.normal(size=(8, 3, k)), jnp.float32)
        dirs = rng.normal(size=(8, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        out = eval_sh(deg, sh, jnp.asarray(dirs))
        assert out.shape == (8, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestGaussians:
    def test_covariance_psd_and_eigvals(self, scene):
        C = scene.covariances()
        # eigvals of M M^T are exp(2s)
        eig = np.sort(np.asarray(eigvals_sym3(C)), axis=-1)
        expected = np.sort(np.exp(2 * np.asarray(scene.log_scales)), axis=-1)
        np.testing.assert_allclose(eig, expected, rtol=2e-2, atol=1e-7)

    def test_covariances_packed(self, scene):
        C = np.asarray(scene.covariances())
        packed = np.asarray(scene.covariances_packed())
        np.testing.assert_allclose(packed[:, 0], C[:, 0, 0], atol=1e-7)
        np.testing.assert_allclose(packed[:, 4], C[:, 1, 2], atol=1e-7)

    def test_normals_unit_and_smallest_axis(self, scene):
        g = scene.calculate_normals()
        n = np.asarray(g.normals)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
        # normal should be the eigenvector of the smallest eigenvalue:
        # n^T Sigma n == min eig == exp(2*min(s))
        C = np.asarray(scene.covariances())
        q = np.einsum("ni,nij,nj->n", n, C, n)
        expected = np.exp(2 * np.asarray(scene.log_scales).min(axis=1))
        np.testing.assert_allclose(q, expected, rtol=1e-3)

    def test_validate_covariances_clamps(self, scene):
        import dataclasses

        bad = dataclasses.replace(
            scene, log_scales=scene.log_scales.at[0].set(jnp.array([-30.0, -1.0, -1.0]))
        )
        fixed = bad.validate_covariances(epsilon=1e-7)
        eig_min = np.exp(2 * np.asarray(fixed.log_scales).min())
        assert eig_min >= 1e-7 * 0.99

    def test_magnitudes_sphere(self):
        # Sphere radius r: area = 4 pi r^2 exactly; magnitude = sqrt * opacity
        r = 0.5
        g = Gaussians.create(
            np.zeros((1, 3)),
            np.full((1, 3), np.log(r)),
            np.array([[1.0, 0, 0, 0]]),
            np.ones((1, 3)),
            np.array([0.7]),
        )
        mag = float(g.magnitudes()[0])
        expected = np.sqrt(4 * np.pi * r**2) * 0.7
        assert abs(mag - expected) < 1e-4

    def test_cull_chain(self, scene):
        g = scene.apply_min_opacity(0.5)
        g = g.apply_bounding_box([-1.5, -1.5, -1.5], [1.5, 1.5, 1.5])
        g = g.cull_large_gaussians(0.1)
        filtered, mask = g.filter()
        assert filtered.num_gaussians == mask.sum()
        assert filtered.num_gaussians < scene.num_gaussians
        xyz = np.asarray(filtered.xyz)
        assert (np.abs(xyz) < 1.5).all()
        assert (np.asarray(filtered.opacities) > 0.5).all()

    def test_cull_large_keeps_smallest(self, scene):
        g = scene.cull_large_gaussians(0.25)
        keep = np.asarray(g.keep_mask)
        sizes = np.asarray(scene.magnitudes())
        expected_keep = int(np.floor(scene.num_gaussians * 0.75))
        assert keep.sum() == expected_keep
        assert sizes[keep].max() <= sizes[~keep].min() + 1e-9

    def test_pad_to(self, scene):
        g = scene.pad_to(512)
        assert g.num_gaussians == 512
        assert not np.asarray(g.keep_mask)[-1]
        assert float(g.opacities[-1]) == 0.0


class TestCovarianceRepair:
    def test_non_posdef_detects(self):
        good = jnp.eye(3)[None]
        bad = jnp.diag(jnp.array([1.0, 1.0, -0.5]))[None]
        covs = jnp.concatenate([good, bad])
        mask = np.asarray(non_posdef_mask(covs))
        assert not mask[0] and mask[1]

    def test_validate_repairs(self, rng):
        A = rng.normal(size=(32, 3, 3)).astype(np.float32)
        S = A @ np.transpose(A, (0, 2, 1))
        S[3] = np.diag([1.0, 1.0, -1e-3])  # slightly indefinite
        fixed, keep = validate_covariance_matrices(jnp.asarray(S))
        assert np.asarray(keep).all()
        assert not np.asarray(non_posdef_mask(fixed, epsilon=1e-9)).any()


class TestRotmatToQuat:
    def test_roundtrip_random(self, rng):
        from gs2pc.ops.quaternion import rotmat_to_quat

        q = normalize(jnp.asarray(rng.normal(size=(256, 4)), jnp.float32))
        R = quat_to_rotmat(q)
        q2 = rotmat_to_quat(R)
        # q and -q encode the same rotation: compare rotation matrices.
        np.testing.assert_allclose(quat_to_rotmat(q2), R, atol=2e-5)
        # canonical sign
        assert (np.asarray(q2[:, 0]) >= 0).all()

    def test_near_pi_rotations(self):
        """180-degree rotations have trace -1 (the w-branch is degenerate);
        the candidate selection must pick a stable axis branch."""
        from gs2pc.ops.quaternion import rotmat_to_quat

        Rs = jnp.stack(
            [
                jnp.diag(jnp.array([1.0, -1.0, -1.0])),  # pi about x
                jnp.diag(jnp.array([-1.0, 1.0, -1.0])),  # pi about y
                jnp.diag(jnp.array([-1.0, -1.0, 1.0])),  # pi about z
            ]
        )
        q = rotmat_to_quat(Rs)
        np.testing.assert_allclose(quat_to_rotmat(q), Rs, atol=1e-6)


class TestFromCovariances:
    """External-Sigma entry point (Gaussians.from_covariances)."""

    def test_factor_roundtrip(self, scene):
        covs = scene.covariances()
        g2 = Gaussians.from_covariances(
            scene.xyz, covs, scene.colours, scene.opacities
        )
        np.testing.assert_allclose(
            np.asarray(g2.covariances()), np.asarray(covs), atol=5e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(g2.xyz), np.asarray(scene.xyz), atol=0
        )
        assert np.asarray(g2.keep_mask).all()

    def test_repairs_non_psd(self, rng):
        A = rng.normal(size=(16, 3, 3)).astype(np.float32) * 0.1
        S = A @ np.transpose(A, (0, 2, 1)) + 0.05 * np.eye(3)
        S[5] = np.diag([0.02, 0.02, -1e-3])  # indefinite -> repairable
        g = Gaussians.from_covariances(
            np.zeros((16, 3), np.float32), S,
            np.full((16, 3), 0.5, np.float32),
            np.full(16, 0.8, np.float32),
        )
        # Every emitted covariance is PSD by construction (factor form)...
        assert not np.asarray(
            non_posdef_mask(g.covariances(), epsilon=1e-10)
        ).any()
        # ...and matches the repaired matrices the reference pipeline makes.
        fixed, keep = validate_covariance_matrices(jnp.asarray(S))
        np.testing.assert_allclose(
            np.asarray(g.covariances()), np.asarray(fixed), atol=5e-5, rtol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(g.keep_mask), np.asarray(keep))

    def test_downstream_ops_work(self, rng):
        """The refactored scene drives magnitudes/normals/sampling paths."""
        n = 64
        A = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.05
        S = A @ np.transpose(A, (0, 2, 1)) + 0.01 * np.eye(3)
        g = Gaussians.from_covariances(
            rng.normal(size=(n, 3)).astype(np.float32), S,
            rng.uniform(0, 1, (n, 3)).astype(np.float32),
            rng.uniform(0.3, 1, n).astype(np.float32),
        )
        mags = np.asarray(g.magnitudes())
        assert (mags > 0).all()
        normals = np.asarray(g.calculate_normals().normals)
        np.testing.assert_allclose(
            np.linalg.norm(normals, axis=1), np.ones(n), atol=1e-5
        )

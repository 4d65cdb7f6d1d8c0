"""Gaussian scene container — an immutable pytree of factor-form Gaussians.

Reference parity: gauss_handler.py (``Gaussians`` class).  Key design change
for TPU: we never materialise per-Gaussian 3x3 covariance matrices in the hot
path.  The scene keeps the *factors* — log-scales ``s`` and unit quaternions
``q`` — from which

    M      = R(q) @ diag(exp(s))          (covariance factor)
    Sigma  = M @ M.T                      (covariance, PSD by construction)
    eig(Sigma) = exp(2 s)                 (eigenvalues, no eigh needed)

This collapses the reference's PSD-validation pipeline
(gauss_handler.py:108-166: eps-regularise -> eigh clamp x3 -> cull) into a
single clamp on ``s`` in log-space, removes ``torch.linalg.eigvals`` from the
importance metric (gauss_handler.py:252-279), and lets the sampler draw
``x = mean + M z`` with Mahalanobis distance ``|z|`` (no matrix inverse).

Culling keeps the reference's lazily-ANDed boolean mask semantics
(gauss_handler.py:86-87, :168-169): predicates AND into ``keep_mask`` and the
single dynamic-shape gather (``filter``) happens at a host boundary.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gs2pc.ops.linalg3 import bmm33_nt
from gs2pc.ops.quaternion import quat_to_rotmat

# Knud Thomsen's ellipsoid surface-area exponent (gauss_handler.py:262).
_KT_P = 1.6075

# Default PSD log-scale floor: eig(Sigma) = exp(2 s) >= epsilon = 1e-7.
# Shared with the pipeline's host-sampling path, which mirrors
# validate_covariances on the host-memory scene copy.
PSD_LOG_FLOOR = 0.5 * float(np.log(1e-7))


def upload_f32(x) -> jnp.ndarray:
    """Host->device upload of a float32 array via a FLAT transfer.

    The tunnelled TPU transfers the padded device layout: a (N, k) array
    with small minor dim k pads k up to the lane width, so the wire
    carries up to 128/k x the logical bytes (measured: 4.2 MB/s for
    (N,3) f32 vs 19 MB/s flat).  Uploading the raveled buffer and
    reshaping on device keeps the transfer at logical size.  No-op for
    arrays already on device.
    """
    if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
        return x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    h = np.ascontiguousarray(np.asarray(x), dtype=np.float32)
    if h.ndim >= 2 and h.shape[-1] < 32:
        return jnp.asarray(h.reshape(-1)).reshape(h.shape)
    return jnp.asarray(h)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gaussians:
    """Immutable 3DGS scene.

    Attributes:
        xyz:        (P, 3) float32 centres.
        log_scales: (P, 3) float32 log semi-axis lengths.
        rots:       (P, 4) float32 unit quaternions (wxyz).
        opacities:  (P,)   float32 in [0, 1] (sigmoid already applied).
        colours:    (P, 3) float32; [0, 1] until the pipeline scales to 0-255
                    (mirrors reference flow, gauss_to_pc.py:481/:519).
        shs:        optional (P, 3, K) float32 full SH coefficients.
        normals:    optional (P, 3) float32 unit normals.
        keep_mask:  (P,) bool lazily-ANDed cull filter.
    """

    xyz: jnp.ndarray
    log_scales: jnp.ndarray
    rots: jnp.ndarray
    opacities: jnp.ndarray
    colours: jnp.ndarray
    shs: Optional[jnp.ndarray] = None
    normals: Optional[jnp.ndarray] = None
    keep_mask: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------ #
    # Construction
    # ------------------------------------------------------------------ #
    @staticmethod
    def create(xyz, log_scales, rots, colours, opacities, shs=None) -> "Gaussians":
        xyz = upload_f32(xyz)
        return Gaussians(
            xyz=xyz,
            log_scales=upload_f32(log_scales),
            rots=upload_f32(rots),
            opacities=upload_f32(opacities).reshape(-1),
            colours=upload_f32(colours),
            shs=None if shs is None else upload_f32(shs),
            normals=None,
            keep_mask=jnp.ones(xyz.shape[0], dtype=bool),
        )

    @staticmethod
    def create_fused(
        xyz, log_scales, rots, colours, opacities, shs=None
    ) -> "Gaussians":
        """``create`` via ONE host->device transfer.

        The tunnelled transport charges a fixed per-transfer overhead
        (measured ~0.4 s per buffer where the payload itself moves at
        ~900 MB/s), so uploading the five scene planes separately costs
        ~2 s where one fused flat buffer costs ~0.2 s.  The planes are
        concatenated raveled on the host and split with device-side
        slices (one cheap compiled program, cached across calls).
        Host-side numpy inputs only — device arrays should use
        ``create`` (their transfer is already paid).
        """
        n = int(np.asarray(xyz).shape[0])
        parts = [
            np.ascontiguousarray(a, np.float32).reshape(-1)
            for a in (xyz, log_scales, rots, colours, opacities)
        ]
        sh_k = 0
        if shs is not None:
            sh_host = np.ascontiguousarray(shs, np.float32)
            sh_k = int(sh_host.shape[-1])
            parts.append(sh_host.reshape(-1))
        flat = jnp.asarray(np.concatenate(parts))

        widths = [3, 3, 4, 3, 1] + ([3 * sh_k] if sh_k else [])

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def split(buf, n, widths):
            outs, o = [], 0
            for w in widths:
                outs.append(jax.lax.dynamic_slice_in_dim(buf, o, n * w))
                o += n * w
            return outs

        planes = split(flat, n, tuple(widths))
        return Gaussians(
            xyz=planes[0].reshape(n, 3),
            log_scales=planes[1].reshape(n, 3),
            rots=planes[2].reshape(n, 4),
            colours=planes[3].reshape(n, 3),
            opacities=planes[4],
            shs=planes[5].reshape(n, 3, sh_k) if sh_k else None,
            normals=None,
            keep_mask=jnp.ones(n, dtype=bool),
        )

    @staticmethod
    def from_covariances(
        xyz,
        covariances,
        colours,
        opacities,
        shs=None,
        validate: bool = True,
    ) -> "Gaussians":
        """Build a scene from externally supplied dense 3x3 covariances.

        The external-Sigma entry point: covariances that did NOT come from
        (scale, rotation) factors — e.g. a downstream tool's export — first
        run the reference's matrix-space repair pipeline
        (gauss_handler.py:108-166: eps-regularise -> eigh clamp x3 -> cull
        irreparable rows; ops/covariance.py), then are refactored into the
        TPU-native factor form via one batched eigh:

            Sigma = V diag(lambda) V^T  =>  log_scales = 0.5 log(lambda),
            rots = quat(V)  (V's handedness fixed so det = +1),

        so Sigma == covariance_factors() @ covariance_factors().T exactly
        and every downstream op (render, sample, cull) works unchanged.
        Rows that remain non-PSD after repair are marked in ``keep_mask``
        (the reference culls them, gauss_handler.py:161-164).
        """
        from gs2pc.ops.covariance import validate_covariance_matrices
        from gs2pc.ops.quaternion import rotmat_to_quat

        covs = jnp.asarray(covariances, jnp.float32)
        if validate:
            covs, keep = validate_covariance_matrices(covs)
        else:
            keep = jnp.ones(covs.shape[0], dtype=bool)

        eigvals, eigvecs = jnp.linalg.eigh(covs)  # ascending, orthonormal V
        eigvals = jnp.maximum(eigvals, 1e-12)
        # eigh may return a left-handed basis; flip one column so V is a
        # proper rotation before the quaternion conversion.
        det = jnp.linalg.det(eigvecs)
        eigvecs = eigvecs * jnp.stack(
            [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
        )[..., None, :]
        scene = Gaussians.create(
            xyz,
            0.5 * jnp.log(eigvals),
            rotmat_to_quat(eigvecs),
            colours,
            opacities,
            shs=shs,
        )
        return dataclasses.replace(scene, keep_mask=keep)

    @property
    def num_gaussians(self) -> int:
        return self.xyz.shape[0]

    # ------------------------------------------------------------------ #
    # Derived geometry (pure, jit-friendly)
    # ------------------------------------------------------------------ #
    def scales(self) -> jnp.ndarray:
        """(P, 3) linear semi-axis lengths exp(s)."""
        return jnp.exp(self.log_scales)

    def rotation_matrices(self) -> jnp.ndarray:
        return quat_to_rotmat(self.rots)

    def covariance_factors(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """(P, 3, 3) factor M = R diag(exp(modifier * s)); Sigma = M M^T.

        Matches build_covariance_from_scaling_rotation
        (gauss_handler.py:60-63): L = R @ diag(exp(mod*s)), Sigma = L L^T.
        """
        R = self.rotation_matrices()
        s = jnp.exp(scaling_modifier * self.log_scales)
        return R * s[:, None, :]

    def covariances(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """(P, 3, 3) dense covariance matrices (host-boundary use only)."""
        M = self.covariance_factors(scaling_modifier)
        return bmm33_nt(M, M)

    def covariances_packed(self) -> jnp.ndarray:
        """(P, 6) upper-triangular packing [xx, xy, xz, yy, yz, zz].

        Matches strip_symmetric (gauss_render.py:195-208).
        """
        C = self.covariances()
        return jnp.stack(
            [
                C[:, 0, 0],
                C[:, 0, 1],
                C[:, 0, 2],
                C[:, 1, 1],
                C[:, 1, 2],
                C[:, 2, 2],
            ],
            axis=-1,
        )

    def calculate_normals(self) -> "Gaussians":
        """Normal = rotation of the one-hot axis of the smallest scale.

        Matches gauss_handler.py:89-106 (argmin over scales, rotate by R);
        R @ e_k is simply the k-th column of R, so this is a single gather.
        """
        k = jnp.argmin(self.log_scales, axis=1)
        R = self.rotation_matrices()
        normals = jnp.take_along_axis(R, k[:, None, None], axis=2)[..., 0]
        return dataclasses.replace(self, normals=normals)

    # ------------------------------------------------------------------ #
    # PSD validation (factor space)
    # ------------------------------------------------------------------ #
    def validate_covariances(self, epsilon: float = 1e-7) -> "Gaussians":
        """Clamp degenerate scales so every Sigma is positive-definite.

        Replaces the reference's 3-stage regularise/eigh-clamp/cull flow
        (gauss_handler.py:142-166).  In factor form eig(Sigma) = exp(2 s),
        so clamping ``s >= 0.5 log(eps)`` is exactly the eigenvalue clamp,
        and no Gaussian ever needs culling — the keep-all mask the reference
        would return corresponds to our unchanged ``keep_mask``.
        """
        floor = (
            PSD_LOG_FLOOR if epsilon == 1e-7 else 0.5 * float(np.log(epsilon))
        )
        return dataclasses.replace(
            self, log_scales=jnp.maximum(self.log_scales, floor)
        )

    # ------------------------------------------------------------------ #
    # Importance metric
    # ------------------------------------------------------------------ #
    def magnitudes(self, contributions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """sqrt(Knud-Thomsen ellipsoid area) * contribution (or opacity).

        Matches get_gaussian_magnitudes (gauss_handler.py:252-279) but uses
        semi-axes a,b,c = exp(s) directly instead of sqrt(eigvals(Sigma)).
        """
        a = jnp.exp(self.log_scales[:, 0])
        b = jnp.exp(self.log_scales[:, 1])
        c = jnp.exp(self.log_scales[:, 2])
        p = _KT_P
        radicand = ((a * b) ** p + (a * c) ** p + (b * c) ** p) / 3.0
        surface_area = 4.0 * jnp.pi * radicand ** (1.0 / p)
        size = jnp.sqrt(surface_area)
        if contributions is None:
            contributions = self.opacities
        return size * contributions

    # ------------------------------------------------------------------ #
    # Cull predicates (lazily ANDed into keep_mask)
    # ------------------------------------------------------------------ #
    def add_to_cull(self, keep: jnp.ndarray) -> "Gaussians":
        """AND a boolean keep-mask into the pending filter
        (gauss_handler.py:168-169)."""
        return dataclasses.replace(self, keep_mask=self.keep_mask & keep)

    def apply_min_opacity(self, min_opacity: float) -> "Gaussians":
        """gauss_handler.py:195-203 — keep opacity > min_opacity."""
        if min_opacity > 0.0:
            return self.add_to_cull(self.opacities > min_opacity)
        return self

    def apply_bounding_box(self, bb_min, bb_max) -> "Gaussians":
        """gauss_handler.py:205-224 — strict axis-aligned bounds."""
        g = self
        if bb_min is not None:
            bb_min = jnp.asarray(bb_min, jnp.float32)
            g = g.add_to_cull(jnp.all(g.xyz > bb_min, axis=1))
        if bb_max is not None:
            bb_max = jnp.asarray(bb_max, jnp.float32)
            g = g.add_to_cull(jnp.all(g.xyz < bb_max, axis=1))
        return g

    def cull_large_gaussians(self, cull_percent: float) -> "Gaussians":
        """Remove the largest ``cull_percent`` fraction by magnitude.

        Reference (gauss_handler.py:235-250) ANDs *indices* into the bool
        mask — a latent bug; the intended semantics (keep the smallest
        floor(P*(1-pct)) Gaussians) is implemented here via a rank mask.
        """
        if cull_percent <= 0.0:
            return self
        sizes = self.magnitudes()
        cull_index = int(np.floor(self.num_gaussians * (1.0 - cull_percent)))
        order = jnp.argsort(sizes)
        ranks = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        return self.add_to_cull(ranks < cull_index)

    def apply_knn_filter(
        self, k: int = 10, max_dist: float = 1.0, window: int = 32
    ) -> "Gaussians":
        """Cull Gaussians whose mean k-NN distance exceeds ``max_dist``.

        The reference sketches (but comments out) a KDTree-based variant
        (gauss_handler.py:226-233).  Here the k nearest neighbours are
        approximated on-device via Morton-order windows — the same
        fixed-shape scheme as gs2pc.meshing.statistical_outlier_mask.
        """
        from gs2pc.meshing import knn_mean_distance

        mean_d = knn_mean_distance(self.xyz, k=k, window=window)
        return self.add_to_cull(mean_d <= max_dist)

    # ------------------------------------------------------------------ #
    # Filtering (host boundary — dynamic output shape)
    # ------------------------------------------------------------------ #
    def filter(self) -> tuple["Gaussians", np.ndarray]:
        """Gather kept Gaussians; returns (filtered scene, kept bool mask).

        Dynamic-shape: call outside jit (mirrors filter_gaussians,
        gauss_handler.py:171-193, which is likewise a host-sync gather).
        """
        mask = np.asarray(self.keep_mask)
        idx = np.nonzero(mask)[0]

        def take(x):
            return None if x is None else jnp.asarray(np.asarray(x)[idx])

        out = Gaussians(
            xyz=take(self.xyz),
            log_scales=take(self.log_scales),
            rots=take(self.rots),
            opacities=take(self.opacities),
            colours=take(self.colours),
            shs=take(self.shs),
            normals=take(self.normals),
            keep_mask=jnp.ones(len(idx), dtype=bool),
        )
        return out, mask

    def pad_to(self, p_pad: int) -> "Gaussians":
        """Pad to a static row count with inert Gaussians (opacity 0,
        keep_mask False) so downstream kernels see lane-aligned shapes."""
        p = self.num_gaussians
        if p_pad < p:
            raise ValueError(f"pad_to({p_pad}) smaller than {p}")
        extra = p_pad - p
        if extra == 0:
            return self

        def pad(x, fill=0.0):
            if x is None:
                return None
            widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        rots = jnp.concatenate(
            [
                self.rots,
                jnp.tile(
                    jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32), (extra, 1)
                ),
            ]
        )
        return Gaussians(
            xyz=pad(self.xyz),
            log_scales=pad(self.log_scales),
            rots=rots,
            opacities=pad(self.opacities),
            colours=pad(self.colours),
            shs=pad(self.shs),
            normals=pad(self.normals),
            keep_mask=pad(self.keep_mask, fill=False),
        )

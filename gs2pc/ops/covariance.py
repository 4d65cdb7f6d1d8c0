"""Dense-covariance validation ops (external-Sigma path).

gs2pc's own pipeline never needs these: covariances built from factors are
PSD by construction and validated by a log-space clamp
(gs2pc.models.gaussians.Gaussians.validate_covariances).  These functions
exist for parity with the reference's matrix-space repair pipeline
(gauss_handler.py:108-166) when covariances arrive from an external source.
"""

from __future__ import annotations

import jax.numpy as jnp

from gs2pc.ops.eig3 import min_eigval_sym3
from gs2pc.ops.linalg3 import eig_recompose3


def non_posdef_mask(covariances: jnp.ndarray, epsilon: float = 1e-10) -> jnp.ndarray:
    """True where a covariance is NOT positive-definite (any eig <= eps).

    Parity: gauss_handler.py:108-112, with closed-form symmetric
    eigenvalues instead of torch.linalg.eigvals.
    """
    return min_eigval_sym3(covariances) <= epsilon


def regularise_covariances(
    covariances: jnp.ndarray, mask: jnp.ndarray | None = None, epsilon: float = 5e-7
) -> jnp.ndarray:
    """Add eps*I to (masked) covariances (gauss_handler.py:129-140)."""
    eye = epsilon * jnp.eye(3, dtype=covariances.dtype)
    if mask is None:
        return covariances + eye
    return jnp.where(mask[:, None, None], covariances + eye, covariances)


def clamp_covariances(
    covariances: jnp.ndarray, mask: jnp.ndarray | None = None, epsilon: float = 1e-6
) -> jnp.ndarray:
    """Eigen-clamp to positive-definite (gauss_handler.py:114-127).

    Uses jnp.linalg.eigh (batched symmetric eigendecomposition — supported
    by XLA on TPU); only ever applied to the rare offenders.
    """
    eigvals, eigvecs = jnp.linalg.eigh(covariances)
    eigvals = jnp.maximum(eigvals, epsilon)
    fixed = eig_recompose3(eigvecs, eigvals)
    if mask is None:
        return fixed
    return jnp.where(mask[:, None, None], fixed, covariances)


def validate_covariance_matrices(
    covariances: jnp.ndarray,
    regularise: bool = True,
    epsilon: float = 1e-7,
    min_ps_epsilon: float = 1e-8,
    num_clamp_iters: int = 3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full repair pipeline (gauss_handler.py:142-166).

    Returns (repaired covariances, keep_mask) where keep_mask is False for
    covariances that remain non-PSD after ``num_clamp_iters`` clamps.
    """
    covs = regularise_covariances(covariances) if regularise else covariances
    for _ in range(num_clamp_iters):
        bad = non_posdef_mask(covs, epsilon=epsilon)
        covs = clamp_covariances(covs, mask=bad, epsilon=epsilon)
    keep = ~non_posdef_mask(covs, epsilon=min_ps_epsilon)
    return covs, keep

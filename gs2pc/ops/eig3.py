"""Closed-form eigenvalues of symmetric 3x3 matrices.

The reference calls ``torch.linalg.eigvals`` / ``eigh`` on millions of 3x3
covariances (gauss_handler.py:108-127, :259).  General eigendecomposition is
a poor fit for the TPU (tiny batched LAPACK-style ops); the symmetric-3x3
case has an exact trigonometric closed form (Smith 1961) that is pure
element-wise VPU work and vectorises over any batch shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigvals_sym3(A: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending order.

    Uses the trigonometric solution of the characteristic cubic; exact for
    symmetric input and fully element-wise (no iteration, no pivoting).
    """
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    # Floor p itself (not p^2) so p**3 cannot underflow f32 for
    # near-isotropic matrices; the eps-sized perturbation is negligible.
    p = jnp.maximum(jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0)), eps)

    # det(B) / (2 p^3) with B = A - q I
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)

    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def min_eigval_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Smallest eigenvalue of symmetric (..., 3, 3) matrices."""
    return eigvals_sym3(A)[..., 0]

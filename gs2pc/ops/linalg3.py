"""Exact-f32 dim-3 contractions, unrolled onto the VPU.

Why this module exists: on TPU, XLA lowers f32 ``jnp.dot`` / ``@`` /
``einsum`` onto the MXU, whose default precision truncates inputs to
bfloat16 (three-pass refinement only under an explicit
``Precision.HIGHEST``).  Worse, the *same* matmul compiled inside two
different programs (e.g. the tile renderer vs the dense oracle) can fuse
differently and disagree with itself at bf16 scale.  For the camera
projections here the contraction dimension is 3 — the MXU's 128x128
systolic tiles are ~98% padding, so routing these through the MXU is both
inaccurate AND slow.  Unrolling the K=3 loop into elementwise
multiply-adds keeps every operand in true f32 on the VPU, is bit-stable
across programs, and fuses into neighbouring elementwise work.

These replace the reference's per-thread scalar GLM math
(forward.cu:76-271 transformPoint4x4 / computeCov2D), which is exact f32
on CUDA — this module restores that exactness on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine3(points: jnp.ndarray, rows3: jnp.ndarray, t3: jnp.ndarray) -> jnp.ndarray:
    """Exact ``points @ rows3.T + t3`` for (..., 3) points, (3, 3) rows.

    Equivalent to the row-vector transform by a 3x4 [R | t] block, unrolled
    so no MXU matmul is emitted.
    """
    x = points[..., 0]
    y = points[..., 1]
    z = points[..., 2]
    return jnp.stack(
        [
            rows3[0, 0] * x + rows3[0, 1] * y + rows3[0, 2] * z + t3[0],
            rows3[1, 0] * x + rows3[1, 1] * y + rows3[1, 2] * z + t3[1],
            rows3[2, 0] * x + rows3[2, 1] * y + rows3[2, 2] * z + t3[2],
        ],
        axis=-1,
    )


def dotrow3(points: jnp.ndarray, row3: jnp.ndarray, b) -> jnp.ndarray:
    """Exact ``points @ row3 + b`` for one (3,) row — returns (...,)."""
    return (
        row3[0] * points[..., 0]
        + row3[1] * points[..., 1]
        + row3[2] * points[..., 2]
        + b
    )


def rot_factors3(R: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Exact ``einsum('ij,pjk->pik', R, F)`` for (3, 3) R, (P, 3, 3) F."""
    rows = [
        R[i, 0] * F[..., 0, :] + R[i, 1] * F[..., 1, :] + R[i, 2] * F[..., 2, :]
        for i in range(3)
    ]
    return jnp.stack(rows, axis=-2)


def bmm33_nt(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Exact batched ``A @ B.swapaxes(-1,-2)`` for (..., 3, 3) operands.

    out[..., i, k] = sum_j A[..., i, j] * B[..., k, j]
    """
    return (A[..., :, None, :] * B[..., None, :, :]).sum(-1)


def eig_recompose3(eigvecs: jnp.ndarray, eigvals: jnp.ndarray) -> jnp.ndarray:
    """Exact ``einsum('...ij,...j,...kj->...ik', V, w, V)`` (V diag(w) V^T)."""
    Vw = eigvecs * eigvals[..., None, :]
    return bmm33_nt(Vw, eigvecs)

"""Quaternion utilities (wxyz convention).

Reference parity: gauss_handler.py:26-47 (build_rotation) and
transform_dataloader.py:24-42 (qvec2rotmat) — both use the same wxyz
(r, x, y, z) element order.  Here the rotation build is a single vectorised
jnp expression usable under jit/vmap on (..., 4) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalise quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 4) wxyz quaternions to (..., 3, 3) rotation matrices.

    Matches the element layout of the reference's ``build_rotation``
    (gauss_handler.py:37-45).  Quaternions are assumed pre-normalised
    (the loaders normalise on load, as the reference does at
    gauss_dataloader.py:80).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3, 3) rotation matrices to (..., 4) wxyz quaternions.

    Branchless Shepperd construction (all four trace candidates computed,
    the numerically largest selected per element) — jit/vmap friendly, no
    data-dependent control flow.  Inverse of ``quat_to_rotmat`` up to the
    global q/-q sign (normalised so w >= 0).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # 4 q_i^2 candidates (each >= 0 for a true rotation; clamp for noise).
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    cand = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(cand, axis=-1)
    s = jnp.sqrt(jnp.maximum(jnp.take_along_axis(cand, best[..., None], -1), 1e-12))[
        ..., 0
    ]
    half_s = 0.5 * s
    quarter = 0.25 / half_s

    # Off-diagonal combinations (quat_to_rotmat layout above):
    #   m21 - m12 = 4 w x     m01 + m10 = 4 x y
    #   m02 - m20 = 4 w y     m02 + m20 = 4 x z
    #   m10 - m01 = 4 w z     m12 + m21 = 4 y z
    q_w = jnp.stack(
        [half_s, (m21 - m12) * quarter, (m02 - m20) * quarter, (m10 - m01) * quarter],
        axis=-1,
    )
    q_x = jnp.stack(
        [(m21 - m12) * quarter, half_s, (m01 + m10) * quarter, (m02 + m20) * quarter],
        axis=-1,
    )
    q_y = jnp.stack(
        [(m02 - m20) * quarter, (m01 + m10) * quarter, half_s, (m12 + m21) * quarter],
        axis=-1,
    )
    q_z = jnp.stack(
        [(m10 - m01) * quarter, (m02 + m20) * quarter, (m12 + m21) * quarter, half_s],
        axis=-1,
    )
    stacked = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(stacked, best[..., None, None], axis=-2)[..., 0, :]
    q = normalize(q)
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)  # canonical w >= 0


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) vectors by (..., 4) wxyz quaternions.

    Identical to ``quat_to_rotmat(q) @ v`` but stays in (..., 3) arrays —
    on TPU a materialised (N, 3, 3) matrix batch pays tiny-minor-dim
    relayouts that make the equivalent einsum ~10x slower.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)

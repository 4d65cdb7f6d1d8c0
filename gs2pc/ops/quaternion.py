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

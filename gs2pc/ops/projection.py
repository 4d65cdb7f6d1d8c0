"""Per-Gaussian camera preprocessing: project, EWA cov2D, conic, tile rect.

Reference parity: preprocessCUDA + computeCov2D (forward.cu:76-271),
getRect/ndc2Pix (auxiliary.h), and the equivalent python-renderer math
(gauss_render.py:101-180).  Everything is batched jnp over the Gaussian
axis; the EWA Jacobian chain is computed on covariance *factors*
(M2 = J W M3, cov2D = M2 M2^T + 0.3 I) instead of full 3x3 covariances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gs2pc.ops.linalg3 import affine3, dotrow3, rot_factors3

# Frustum near-cull depth (auxiliary.h:167 — p_view.z <= 0.2 is culled).
NEAR_Z = 0.2
# Low-pass dilation of the 2D covariance (forward.cu:219: h_var = 0.3).
H_VAR = 0.3


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all (P,) or (P, k))."""

    depth: jnp.ndarray  # view-space z
    xy: jnp.ndarray  # (P, 2) pixel-space centre
    conic: jnp.ndarray  # (P, 3) inverse 2D covariance (A, B, C)
    opacity: jnp.ndarray  # effective opacity (incl. antialias scaling)
    radius: jnp.ndarray  # (P,) rect radius: ceil(min(3 sigma, r_alpha))
    r_alpha_sq: jnp.ndarray  # (P,) squared CULL radius (big in full-rect mode)
    radius_q: jnp.ndarray  # (P,) quality radius ceil(min(3 sigma, r_alpha)):
    # the reach within which alpha can exceed 1/255 — truncation beyond it
    # cannot change the blend, only surface-distance coverage
    rect_min: jnp.ndarray  # (P, 2) int32 tile-coords inclusive min (x, y)
    rect_max: jnp.ndarray  # (P, 2) int32 tile-coords exclusive max (x, y)
    tiles_touched: jnp.ndarray  # (P,) int32
    valid: jnp.ndarray  # (P,) bool — in frustum, invertible cov, >=1 tile


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """((v + 1) * S - 1) / 2 (auxiliary.h ndc2Pix)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    means: jnp.ndarray,
    cov_factors: jnp.ndarray,
    opacities: jnp.ndarray,
    alive: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    tanfovx,
    tanfovy,
    focal_x,
    focal_y,
    width,
    height,
    tile: int = 16,
    antialiasing: bool = False,
    adaptive_radius: bool = True,
) -> Preprocessed:
    """Project P Gaussians for one camera.

    Args:
        means: (P, 3) world centres.
        cov_factors: (P, 3, 3) M with Sigma = M M^T.
        opacities: (P,).
        alive: (P,) bool — padding / pre-culled mask.
        viewmatrix: (4, 4) world->view (column-vector convention).
        projmatrix: (4, 4) full projection (P_gl @ V).
        width / height: dynamic true image dims (traced scalars ok).
        tile: pixel tile edge (static).
        adaptive_radius: shrink the rect/cull radius to the alpha-cutoff
            radius (AdR).  EXACT for blending (alpha < 1/255 pairs are
            skipped by the blend anyway) but NOT for surface distances —
            the reference's surface pass measures |depth - expected_depth|
            over the full 3-sigma rect with no alpha involvement
            (forward.cu:460-477) — so callers computing surface distances
            must pass False.
    """
    # --- view / clip transforms -------------------------------------- #
    # All dim-3 contractions go through gs2pc.ops.linalg3 (exact-f32 VPU
    # FMAs) — an MXU matmul here is bf16 by default and, compiled in two
    # different programs, disagrees with itself (see linalg3 docstring).
    Rv = viewmatrix[:3, :3]
    tv = viewmatrix[:3, 3]
    p_view = affine3(means, Rv, tv)
    depth = p_view[:, 2]
    in_front = depth > NEAR_Z

    ph = affine3(means, projmatrix[:3, :3], projmatrix[:3, 3])
    pw = dotrow3(means, projmatrix[3, :3], projmatrix[3, 3])
    inv_w = 1.0 / (pw + 1e-7)
    ndc_x = ph[:, 0] * inv_w
    ndc_y = ph[:, 1] * inv_w
    pix = jnp.stack([ndc2pix(ndc_x, width), ndc2pix(ndc_y, height)], axis=-1)

    # --- EWA 2D covariance on factors (computeCov2D, forward.cu:76) --- #
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    # T0 = W M3 (world->view rotate the factor), rows combined by J.
    T0 = rot_factors3(Rv, cov_factors)
    inv_z = 1.0 / tz
    row0 = (focal_x * inv_z)[:, None] * T0[:, 0, :] - (
        focal_x * tx * inv_z * inv_z
    )[:, None] * T0[:, 2, :]
    row1 = (focal_y * inv_z)[:, None] * T0[:, 1, :] - (
        focal_y * ty * inv_z * inv_z
    )[:, None] * T0[:, 2, :]

    cov_a = jnp.sum(row0 * row0, axis=-1)  # cov2d[0,0]
    cov_b = jnp.sum(row0 * row1, axis=-1)  # cov2d[0,1]
    cov_c = jnp.sum(row1 * row1, axis=-1)  # cov2d[1,1]

    det_raw = cov_a * cov_c - cov_b * cov_b
    cov_a = cov_a + H_VAR
    cov_c = cov_c + H_VAR
    det = cov_a * cov_c - cov_b * cov_b

    opacity = jnp.asarray(opacities)
    if antialiasing:
        # forward.cu:224-225: opacity *= sqrt(max(2.5e-5, det_raw/det))
        scale = jnp.sqrt(jnp.maximum(2.5e-5, det_raw / jnp.maximum(det, 1e-30)))
        opacity = opacity * scale

    invertible = det > 0.0
    det_inv = 1.0 / jnp.where(invertible, det, 1.0)
    conic = jnp.stack([cov_c * det_inv, -cov_b * det_inv, cov_a * det_inv], axis=-1)

    # --- radius + tile rect (forward.cu:236-244, auxiliary.h getRect) - #
    mid = 0.5 * (cov_a + cov_c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    # Adaptive radius (AdR-Gaussian, arXiv 2409.08669): beyond
    # r_alpha = sqrt(2 lambda_max ln(255 opa)) the best-case alpha is
    # already < 1/255, which the blend skips (forward.cu:412) — so
    # min(3 sigma, r_alpha) culls pairs EXACTLY, changing no output.
    ln_term = jnp.log(jnp.maximum(255.0 * opacity, 1e-12))
    # r_alpha^2 bounds where alpha can reach 1/255 at all (with a small
    # safety factor for f32 rounding in the blend's exp);
    # the RECT radius additionally caps at the reference's 3 sigma.
    r_alpha_true_sq = (
        2.0 * jnp.maximum(lambda_max, 0.0) * jnp.maximum(ln_term, 0.0)
    ) * 1.0001 + 1e-3
    if adaptive_radius:
        r_alpha_sq = r_alpha_true_sq
    else:
        # Full-rect mode: the circle test never culls (reference iterates
        # every rect tile, forward.cu surface pass included).
        r_alpha_sq = jnp.full_like(lambda_max, 3.4e38)
    r_sq = jnp.minimum(9.0 * jnp.maximum(lambda_max, 0.0), r_alpha_sq)
    radius = jnp.ceil(jnp.sqrt(r_sq))
    radius_q = jnp.ceil(
        jnp.sqrt(
            jnp.minimum(9.0 * jnp.maximum(lambda_max, 0.0), r_alpha_true_sq)
        )
    )

    grid_w = (width + tile - 1) // tile
    grid_h = (height + tile - 1) // tile
    rect_min_x = jnp.clip(
        jnp.floor((pix[:, 0] - radius) / tile).astype(jnp.int32), 0, grid_w
    )
    rect_min_y = jnp.clip(
        jnp.floor((pix[:, 1] - radius) / tile).astype(jnp.int32), 0, grid_h
    )
    rect_max_x = jnp.clip(
        jnp.floor((pix[:, 0] + radius + tile - 1) / tile).astype(jnp.int32), 0, grid_w
    )
    rect_max_y = jnp.clip(
        jnp.floor((pix[:, 1] + radius + tile - 1) / tile).astype(jnp.int32), 0, grid_h
    )
    tiles_touched = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)

    # opacity < 1/255 can never pass the blend's alpha cutoff anywhere.
    valid = (
        alive
        & in_front
        & invertible
        & (tiles_touched > 0)
        & (opacity >= 1.0 / 255.0)
    )

    return Preprocessed(
        depth=depth,
        xy=pix,
        conic=conic,
        opacity=opacity,
        radius=radius,
        r_alpha_sq=r_alpha_sq,
        radius_q=radius_q,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=tiles_touched.astype(jnp.int32),
        valid=valid,
    )


def mark_visible(
    means: jnp.ndarray, viewmatrix: jnp.ndarray, projmatrix: jnp.ndarray
) -> jnp.ndarray:
    """Frustum visibility check (parity: markVisible, rasterize_points.cu:147-166).

    The CUDA check reduces to view-space z > 0.2 (auxiliary.h in_frustum).
    """
    del projmatrix  # the reference computes but ignores the NDC bound too
    p_view_z = dotrow3(means, viewmatrix[2, :3], viewmatrix[2, 3])
    return p_view_z > NEAR_Z

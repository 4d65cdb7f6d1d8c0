"""Dense reference renderer — the exactness oracle ("python renderer" role).

Capability parity with the reference's pure-torch fallback renderer
(gauss_render.py:210-465), but sharing the exact blend semantics of the
CUDA path via gs2pc.ops.blend, so it doubles as the parity oracle for the
tile rasterizer.  Complexity is O(pixels x Gaussians): intended for small
scenes, tests, and debugging — the quad-tree/memory-backoff machinery of
the reference python renderer is unnecessary because chunking is explicit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gs2pc.ops.blend import (
    FLOAT_MAX,
    BlendCarry,
    RenderOutput,
    blend_chunk,
    init_carry,
)
from gs2pc.ops.projection import preprocess


def render_dense(
    means: jnp.ndarray,
    cov_factors: jnp.ndarray,
    opacities: jnp.ndarray,
    colours: jnp.ndarray,
    alive: jnp.ndarray,
    camera,  # single-camera CameraBatch slice (CameraBatch.at(i))
    width_pad: int,
    height_pad: int,
    chunk: int = 128,
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    mask: Optional[jnp.ndarray] = None,  # (Hp*Wp,) uint8/bool
    rect_cull: bool = False,  # emulate tile-rect culling (parity testing)
) -> RenderOutput:
    P = means.shape[0]
    n_chunks = -(-P // chunk)
    P_pad = n_chunks * chunk

    prep = preprocess(
        means,
        cov_factors,
        opacities,
        alive,
        camera.viewmatrix,
        camera.projmatrix,
        camera.tanfovx,
        camera.tanfovy,
        camera.focal_x,
        camera.focal_y,
        camera.width,
        camera.height,
        antialiasing=antialiasing,
    )

    # Depth-order all Gaussians (invalid sink to the back).
    sort_key = jnp.where(prep.valid, prep.depth, FLOAT_MAX)
    order = jnp.argsort(sort_key)

    def pad(x, fill=0.0):
        widths = [(0, P_pad - P)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    s_xy = pad(prep.xy[order])
    s_conic = pad(prep.conic[order])
    s_op = pad(prep.opacity[order])
    s_col = pad(colours[order])
    s_depth = pad(prep.depth[order])
    s_valid = pad(prep.valid[order], fill=False)
    s_rmin = pad(prep.rect_min[order])
    s_rmax = pad(prep.rect_max[order])

    # Pixel block = whole (padded) image.
    npx = height_pad * width_pad
    ys, xs = jnp.divmod(jnp.arange(npx, dtype=jnp.int32), width_pad)
    px = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    valid_px = (xs < camera.width) & (ys < camera.height)
    if mask is not None:
        valid_px = valid_px & (mask != 0)

    carry0 = init_carry((npx,), done0=~valid_px)

    tile_xy = jnp.floor(px / 16.0).astype(jnp.int32)  # pixel -> tile coords

    def step(carry: BlendCarry, c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        pair_mask = None
        if rect_cull:
            rmin, rmax = sl(s_rmin), sl(s_rmax)
            pair_mask = (
                (tile_xy[:, None, 0] >= rmin[None, :, 0])
                & (tile_xy[:, None, 0] < rmax[None, :, 0])
                & (tile_xy[:, None, 1] >= rmin[None, :, 1])
                & (tile_xy[:, None, 1] < rmax[None, :, 1])
            )
        new_carry, w = blend_chunk(
            carry, px, sl(s_xy), sl(s_conic), sl(s_op), sl(s_col), sl(s_depth),
            sl(s_valid), pair_mask=pair_mask,
        )
        m = jnp.max(w, axis=0)  # (chunk,) max contribution over pixels
        arg = jnp.argmax(w, axis=0).astype(jnp.int32)
        return new_carry, (m, arg)

    carry, (m_chunks, arg_chunks) = jax.lax.scan(
        step, carry0, jnp.arange(n_chunks)
    )

    bg = jnp.float32(1.0 if white_bkgd else 0.0)
    img_flat = jnp.where(
        valid_px[:, None],
        carry.colour + carry.transmittance[:, None] * bg,
        0.0,
    )
    ed_flat = jnp.where(valid_px, carry.exp_depth, 0.0)
    einv_flat = jnp.where(valid_px, carry.exp_invdepth, 0.0)

    # Per-gaussian accumulators back in original index order.
    m_sorted = m_chunks.reshape(-1)[:P]
    arg_sorted = arg_chunks.reshape(-1)[:P]
    contrib = jnp.zeros(P, jnp.float32).at[order].set(m_sorted)
    best_pix = jnp.zeros(P, jnp.int32).at[order].set(arg_sorted)
    best_colour = jnp.where(
        (contrib > 0.0)[:, None], img_flat[best_pix], 0.0
    )

    # Surface distance: min over the Gaussian's tile-rect pixels of
    # |depth_g - expected_depth| (deterministic version of the racy
    # shared-memory pass at forward.cu:460-477, using the final depth map).
    if calc_surface_distance:
        def surf_step(_, c):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
            rmin = sl(s_rmin) * 16
            rmax = sl(s_rmax) * 16
            in_rect = (
                (px[:, None, 0] >= rmin[None, :, 0])
                & (px[:, None, 0] < rmax[None, :, 0])
                & (px[:, None, 1] >= rmin[None, :, 1])
                & (px[:, None, 1] < rmax[None, :, 1])
                & valid_px[:, None]
                & sl(s_valid)[None, :]
            )
            dist = jnp.abs(sl(s_depth)[None, :] - ed_flat[:, None])
            dist = jnp.where(in_rect, dist, FLOAT_MAX)
            return None, jnp.min(dist, axis=0)

        _, sd_chunks = jax.lax.scan(surf_step, None, jnp.arange(n_chunks))
        surf = jnp.full(P, FLOAT_MAX, jnp.float32).at[order].set(
            sd_chunks.reshape(-1)[:P]
        )
    else:
        surf = jnp.full(P, FLOAT_MAX, jnp.float32)

    return RenderOutput(
        image=img_flat.reshape(height_pad, width_pad, 3),
        depth=ed_flat.reshape(height_pad, width_pad),
        invdepth=einv_flat.reshape(height_pad, width_pad),
        radii=prep.radius,
        contrib=contrib,
        best_colour=best_colour,
        surf_dist=surf,
    )

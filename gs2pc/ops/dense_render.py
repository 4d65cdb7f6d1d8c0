"""Dense reference renderer — the exactness oracle ("python renderer" role).

Capability parity with the reference's pure-torch fallback renderer
(gauss_render.py:210-465), but sharing the exact blend semantics of the
CUDA path via gs2pc.ops.blend, so it doubles as the parity oracle for the
tile rasterizer.  Complexity is O(pixels x Gaussians): intended for small
scenes, tests, and debugging.

Memory is bounded by construction: both axes are chunked (``chunk``
Gaussians x ``pixel_chunk`` pixels per step), so peak intermediate size is
~pixel_chunk * chunk floats regardless of image resolution — the explicit
equivalent of the reference python renderer's quad-tree splitting and
OOM-retry machinery (gauss_render.py:289-335, :446-465).
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
    pixel_chunk: int = 1 << 16,
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    mask: Optional[jnp.ndarray] = None,  # (Hp*Wp,) uint8/bool
    rect_cull: bool = False,  # emulate tile-rect culling (parity testing)
    block_range: Optional[tuple] = None,  # (lo, count) pixel-block band
) -> RenderOutput:
    """Exact dense oracle (one blend step per Gaussian chunk x pixel block).

    ``block_range=(lo, count)`` renders only the ``count`` pixel blocks
    starting at block ``lo`` — the at-scale PSNR gate (bench.py) uses it
    to split a 1M-Gaussian 720p oracle render into several short
    dispatches instead of one watchdog-length program.  ``count`` must be
    static; ``lo`` may be a traced scalar, so every band shares ONE
    compiled program.  In band mode ``image``/``depth``/``invdepth``
    cover only the selected rows (callers pick ``pixel_chunk`` as a
    multiple of ``width_pad`` so blocks are whole rows) and the
    per-Gaussian accumulators are partial (maxima over the selected
    blocks only)."""
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
        adaptive_radius=not calc_surface_distance,
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

    # Pixel-axis blocking: the per-step working set is (blk, chunk), not
    # (Npx, chunk) — at 1280x736 a full-image block would cost ~0.5 GB per
    # intermediate per step.
    npx = height_pad * width_pad
    blk = min(pixel_chunk, npx)
    n_blk = -(-npx // blk)
    npx_pad = n_blk * blk

    pix = jnp.arange(npx_pad, dtype=jnp.int32)
    ys, xs = jnp.divmod(pix, width_pad)
    px_all = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    valid_all = (xs < camera.width) & (ys < camera.height) & (pix < npx)
    if mask is not None:
        mask_pad = jnp.concatenate(
            [jnp.asarray(mask).reshape(-1), jnp.zeros(npx_pad - npx, mask.dtype)]
        )
        valid_all = valid_all & (mask_pad != 0)

    px_blocks = px_all.reshape(n_blk, blk, 2)
    valid_blocks = valid_all.reshape(n_blk, blk)
    base_blocks = jnp.arange(n_blk, dtype=jnp.int32) * blk
    if block_range is not None:
        b_lo, n_sel = block_range
        n_sel = int(n_sel)
        px_blocks = jax.lax.dynamic_slice_in_dim(px_blocks, b_lo, n_sel)
        valid_blocks = jax.lax.dynamic_slice_in_dim(valid_blocks, b_lo, n_sel)
        base_blocks = jax.lax.dynamic_slice_in_dim(base_blocks, b_lo, n_sel)

    def block_step(pg, inp):
        m_run, apix_run, sd_run = pg
        px, valid_px, base = inp
        tile_xy = jnp.floor(px / 16.0).astype(jnp.int32)
        carry0 = init_carry((blk,), done0=~valid_px)

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
                carry, px, sl(s_xy), sl(s_conic), sl(s_op), sl(s_col),
                sl(s_depth), sl(s_valid), pair_mask=pair_mask,
            )
            m = jnp.max(w, axis=0)  # (chunk,) max contribution over pixels
            arg = jnp.argmax(w, axis=0).astype(jnp.int32)
            return new_carry, (m, arg)

        carry, (m_chunks, arg_chunks) = jax.lax.scan(
            step, carry0, jnp.arange(n_chunks)
        )
        m_blk = m_chunks.reshape(-1)  # (P_pad,) sorted order
        apix_blk = base + arg_chunks.reshape(-1)

        # Combine with the running per-Gaussian max.  Strict '>' keeps the
        # EARLIEST block's pixel on ties — identical to a single full-image
        # argmax (first-occurrence semantics).
        upd = m_blk > m_run
        m_run = jnp.where(upd, m_blk, m_run)
        apix_run = jnp.where(upd, apix_blk, apix_run)

        bg = jnp.float32(1.0 if white_bkgd else 0.0)
        img_blk = jnp.where(
            valid_px[:, None],
            carry.colour + carry.transmittance[:, None] * bg,
            0.0,
        )
        ed_blk = jnp.where(valid_px, carry.exp_depth, 0.0)
        einv_blk = jnp.where(valid_px, carry.exp_invdepth, 0.0)

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
                dist = jnp.abs(sl(s_depth)[None, :] - ed_blk[:, None])
                dist = jnp.where(in_rect, dist, FLOAT_MAX)
                return None, jnp.min(dist, axis=0)

            _, sd_chunks = jax.lax.scan(surf_step, None, jnp.arange(n_chunks))
            sd_run = jnp.minimum(sd_run, sd_chunks.reshape(-1))

        return (m_run, apix_run, sd_run), (img_blk, ed_blk, einv_blk)

    pg0 = (
        jnp.zeros(P_pad, jnp.float32),
        jnp.zeros(P_pad, jnp.int32),
        jnp.full(P_pad, FLOAT_MAX, jnp.float32),
    )
    (m_sorted, apix_sorted, sd_sorted), (img_b, ed_b, einv_b) = jax.lax.scan(
        block_step, pg0, (px_blocks, valid_blocks, base_blocks)
    )

    if block_range is not None:
        img_flat = img_b.reshape(n_sel * blk, 3)
        ed_flat = ed_b.reshape(n_sel * blk)
        einv_flat = einv_b.reshape(n_sel * blk)
        out_h = (n_sel * blk) // width_pad
    else:
        img_flat = img_b.reshape(npx_pad, 3)[:npx]
        ed_flat = ed_b.reshape(npx_pad)[:npx]
        einv_flat = einv_b.reshape(npx_pad)[:npx]
        out_h = height_pad

    # Per-gaussian accumulators back in original index order.
    contrib = jnp.zeros(P, jnp.float32).at[order].set(m_sorted[:P])
    best_pix = jnp.zeros(P, jnp.int32).at[order].set(apix_sorted[:P])
    best_pix = jnp.clip(best_pix, 0, npx - 1)
    if block_range is not None:
        # best_pix is a GLOBAL pixel id but only the band's rows exist;
        # band callers want images, not colour snapshots.
        best_colour = jnp.zeros((P, 3), jnp.float32)
    else:
        best_colour = jnp.where(
            (contrib > 0.0)[:, None], img_flat[best_pix], 0.0
        )

    # Surface distance: min over the Gaussian's tile-rect pixels of
    # |depth_g - expected_depth| (deterministic version of the racy
    # shared-memory pass at forward.cu:460-477, using the final depth map).
    if calc_surface_distance:
        surf = jnp.full(P, FLOAT_MAX, jnp.float32).at[order].set(sd_sorted[:P])
    else:
        surf = jnp.full(P, FLOAT_MAX, jnp.float32)

    return RenderOutput(
        image=img_flat.reshape(out_h, width_pad, 3),
        depth=ed_flat.reshape(out_h, width_pad),
        invdepth=einv_flat.reshape(out_h, width_pad),
        radii=prep.radius,
        contrib=contrib,
        best_colour=best_colour,
        surf_dist=surf,
    )

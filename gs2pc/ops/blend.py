"""Shared front-to-back alpha-compositing chunk op.

Exact semantics of the reference blend loop (renderCUDA, forward.cu:303-497):

  * power = -0.5 (A dx^2 + C dy^2) - B dx dy; skip if power > 0
  * alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255
  * test_T = T (1 - alpha); if test_T < 1e-4 the pixel is DONE and the
    triggering Gaussian is NOT composited
  * contribution w = alpha * T; colour/expected-depth/inv-depth accumulate
    w-weighted; per-Gaussian max-over-pixels of w with arg pixel

Expressed as masked cumulative products along the (depth-ordered) chunk
axis, so both the dense oracle and the tile rasterizer share one op.  The
sequential CUDA early-exit becomes a per-pixel ``done`` flag: everything at
or after the first trigger is masked to zero — bit-compatible outcomes
without data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4

FLOAT_MAX = jnp.finfo(jnp.float32).max


class RenderOutput(NamedTuple):
    """Per-camera render products (padded image dims)."""

    image: jnp.ndarray  # (Hp, Wp, 3)
    depth: jnp.ndarray  # (Hp, Wp) expected depth
    invdepth: jnp.ndarray  # (Hp, Wp) expected inverse depth
    radii: jnp.ndarray  # (P,) pixel radii
    contrib: jnp.ndarray  # (P,) per-image max contribution alpha*T
    best_colour: jnp.ndarray  # (P, 3) rendered colour at argmax pixel
    surf_dist: jnp.ndarray  # (P,) min |depth_g - expected_depth|, FLOAT_MAX if none


class BlendCarry(NamedTuple):
    transmittance: jnp.ndarray  # (..., Npx)
    done: jnp.ndarray  # (..., Npx) bool
    colour: jnp.ndarray  # (..., Npx, 3)
    exp_depth: jnp.ndarray  # (..., Npx)
    exp_invdepth: jnp.ndarray  # (..., Npx)


def init_carry(shape_px: tuple, done0: jnp.ndarray) -> BlendCarry:
    return BlendCarry(
        transmittance=jnp.ones(shape_px, jnp.float32),
        done=done0,
        colour=jnp.zeros(shape_px + (3,), jnp.float32),
        exp_depth=jnp.zeros(shape_px, jnp.float32),
        exp_invdepth=jnp.zeros(shape_px, jnp.float32),
    )


def blend_chunk(
    carry: BlendCarry,
    px: jnp.ndarray,  # (..., Npx, 2) pixel centre coords
    xy: jnp.ndarray,  # (..., C, 2) gaussian pixel centres (depth-ordered)
    conic: jnp.ndarray,  # (..., C, 3)
    opacity: jnp.ndarray,  # (..., C)
    colour: jnp.ndarray,  # (..., C, 3)
    depth: jnp.ndarray,  # (..., C)
    alive: jnp.ndarray,  # (..., C) bool
    pair_mask: jnp.ndarray | None = None,  # (..., Npx, C) bool, optional
):
    """Composite one depth-ordered chunk of Gaussians into a pixel block.

    Returns (new_carry, w) where w (..., Npx, C) is each Gaussian's
    contribution alpha*T at each pixel (zero where skipped) — callers
    reduce it for per-Gaussian max-contribution / argmax-pixel bookkeeping.
    """
    d = px[..., :, None, :] - xy[..., None, :, :]  # (..., Npx, C, 2)
    dx, dy = d[..., 0], d[..., 1]
    A = conic[..., None, :, 0]
    B = conic[..., None, :, 1]
    Cc = conic[..., None, :, 2]
    power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None, :] * jnp.exp(power))

    contrib_ok = (
        (power <= 0.0)
        & (alpha >= ALPHA_MIN)
        & alive[..., None, :]
        & ~carry.done[..., :, None]
    )
    if pair_mask is not None:
        contrib_ok = contrib_ok & pair_mask
    a0 = jnp.where(contrib_ok, alpha, 0.0)

    # T before each gaussian in the chunk (exclusive cumprod).
    cp = jnp.cumprod(1.0 - a0, axis=-1)
    t_before = carry.transmittance[..., :, None] * jnp.concatenate(
        [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
    )

    trigger = contrib_ok & (t_before * (1.0 - alpha) < T_EPS)
    seen = jnp.cumsum(trigger.astype(jnp.int32), axis=-1) > 0  # inclusive
    allowed = ~seen
    a_used = a0 * allowed
    w = a_used * t_before  # (..., Npx, C); zero wherever skipped

    new_colour = carry.colour + jnp.einsum(
        "...pc,...cd->...pd", w, colour, preferred_element_type=jnp.float32
    )
    new_ed = carry.exp_depth + jnp.einsum(
        "...pc,...c->...p", w, depth, preferred_element_type=jnp.float32
    )
    inv_d = 1.0 / jnp.where(jnp.abs(depth) < 1e-12, 1e-12, depth)
    new_einv = carry.exp_invdepth + jnp.einsum(
        "...pc,...c->...p", w, inv_d, preferred_element_type=jnp.float32
    )
    new_T = carry.transmittance * jnp.prod(1.0 - a_used, axis=-1)
    new_done = carry.done | jnp.any(trigger, axis=-1)

    new_carry = BlendCarry(
        transmittance=new_T,
        done=new_done,
        colour=new_colour,
        exp_depth=new_ed,
        exp_invdepth=new_einv,
    )
    return new_carry, w

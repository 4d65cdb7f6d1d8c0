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
    """Per-camera render products (padded image dims).

    ``trans`` and ``best_pix`` are populated only on request (the
    Gaussian-axis sharded renderer needs the per-pixel transmittance map
    for its cross-device prefix and the argmax pixel id to re-gather
    colours from the globally composited image)."""

    image: jnp.ndarray  # (Hp, Wp, 3)
    depth: jnp.ndarray  # (Hp, Wp) expected depth
    invdepth: jnp.ndarray  # (Hp, Wp) expected inverse depth
    radii: jnp.ndarray  # (P,) pixel radii
    contrib: jnp.ndarray  # (P,) per-image max contribution alpha*T
    best_colour: jnp.ndarray  # (P, 3) rendered colour at argmax pixel
    surf_dist: jnp.ndarray  # (P,) min |depth_g - expected_depth|, FLOAT_MAX if none
    trans: jnp.ndarray | None = None  # (Hp, Wp) final per-pixel transmittance
    best_pix: jnp.ndarray | None = None  # (P,) argmax flat pixel id
    # (3,) f32 truncation counters [pairs blended, window-truncated
    # candidates, run-cap-dropped pairs]; None from renderers that never
    # truncate (the dense oracle).
    n_dropped: jnp.ndarray | None = None


class BlendCarry(NamedTuple):
    transmittance: jnp.ndarray  # (..., Npx)
    done: jnp.ndarray  # (..., Npx) bool
    colour: jnp.ndarray  # (..., Npx, 3)
    exp_depth: jnp.ndarray  # (..., Npx)
    exp_invdepth: jnp.ndarray  # (..., Npx)


def init_carry(
    shape_px: tuple, done0: jnp.ndarray, t0: jnp.ndarray | None = None
) -> BlendCarry:
    """``t0`` seeds the per-pixel transmittance (default 1) — the
    Gaussian-axis sharded renderer passes the product of all upstream
    depth slabs so each slab composites with absolute weights."""
    return BlendCarry(
        transmittance=(
            jnp.ones(shape_px, jnp.float32) if t0 is None else t0
        ),
        done=done0,
        colour=jnp.zeros(shape_px + (3,), jnp.float32),
        exp_depth=jnp.zeros(shape_px, jnp.float32),
        exp_invdepth=jnp.zeros(shape_px, jnp.float32),
    )


def _scan_incl(x: jnp.ndarray, identity: float, op) -> jnp.ndarray:
    """Inclusive Hillis-Steele scan along the last axis (log2(n) steps)."""
    n = x.shape[-1]
    acc = x
    s = 1
    while s < n:
        fill = jnp.full_like(acc[..., :s], identity)
        acc = op(acc, jnp.concatenate([fill, acc[..., :-s]], axis=-1))
        s *= 2
    return acc


def _scan_excl(x: jnp.ndarray, identity: float, op) -> jnp.ndarray:
    """Exclusive scan along the last axis."""
    inc = _scan_incl(x, identity, op)
    fill = jnp.full_like(inc[..., :1], identity)
    return jnp.concatenate([fill, inc[..., :-1]], axis=-1)


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
    early_stop: bool = True,
):
    """Composite one depth-ordered chunk of Gaussians into a pixel block.

    Returns (new_carry, w) where w (..., Npx, C) is each Gaussian's
    contribution alpha*T at each pixel (zero where skipped) — callers
    reduce it for per-Gaussian max-contribution / argmax-pixel bookkeeping.

    ``early_stop=False`` disables the T<1e-4 trigger so the carried
    transmittance is the exact product of (1 - alpha) over every pair —
    required by the Gaussian-axis sharded renderer, whose cross-device
    prefix decomposition relies on the product being trigger-free.
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

    # T before each gaussian in the chunk (exclusive cumprod).  Explicit
    # Hillis-Steele log-step scans: XLA's cumprod/cumsum can lower to a
    # sequential loop on TPU, which dominates the whole blend.
    cp_excl = _scan_excl(1.0 - a0, 1.0, jnp.multiply)
    t_before = carry.transmittance[..., :, None] * cp_excl

    if early_stop:
        trigger = contrib_ok & (t_before * (1.0 - alpha) < T_EPS)
        seen = _scan_incl(trigger.astype(jnp.float32), 0.0, jnp.maximum) > 0.5
        a_used = a0 * ~seen
    else:
        trigger = jnp.zeros_like(contrib_ok)
        a_used = a0
    w = a_used * t_before  # (..., Npx, C); zero wherever skipped

    # Elementwise multiply + lane reduction instead of einsum: an N=3 (or
    # N=1) dot pads to 128 MXU lanes on TPU — 40x wasted FLOPs.
    new_colour = carry.colour + jnp.stack(
        [jnp.sum(w * colour[..., None, :, ch], axis=-1) for ch in range(3)],
        axis=-1,
    )
    new_ed = carry.exp_depth + jnp.sum(w * depth[..., None, :], axis=-1)
    inv_d = 1.0 / jnp.where(jnp.abs(depth) < 1e-12, 1e-12, depth)
    new_einv = carry.exp_invdepth + jnp.sum(w * inv_d[..., None, :], axis=-1)
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

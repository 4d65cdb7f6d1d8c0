"""Pallas TPU blend kernel — per-tile alpha compositing at full VPU rate.

This is the hand-optimised replacement for the XLA blend loop in
gs2pc.ops.rasterize (itself the TPU redesign of renderCUDA,
forward.cu:303-497).  Mapping:

  * one grid program per 16x16 pixel tile (CUDA: one thread block);
  * the tile's depth-sorted pair run is CONTIGUOUS in HBM (pairs are
    pre-gathered into an Rs-aligned (16, L_al) layout), so each chunk is
    a single async DMA instead of CUDA's shared-memory batch fetch;
  * the 256 tile pixels live on the SUBLANE axis, the chunk's Gaussians
    on the LANE axis; the sequential front-to-back transmittance becomes
    a Hillis-Steele cumulative product over lanes (log2(Rs) rolls);
  * per-pair (max contribution, argmax pixel) are sublane reductions
    DMA'd straight to pair-aligned HBM buffers — the deterministic
    replacement for the CUDA CAS-loop float atomics;
  * per-tile trip count is dynamic (while_loop) with the same
    all-pixels-done early exit as the CUDA kernel.

Alpha semantics are identical to gs2pc.ops.blend (0.99 clamp, 1/255
cutoff, T<1e-4 early stop skipping the triggering Gaussian).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2pc.ops.blend import ALPHA_MAX, ALPHA_MIN, T_EPS

TABLE_LANES = 16  # packed row: xy(2) conic(3) opacity(1) rgb(3) depth(1) pad(6)
TPX = 256  # pixels per 16x16 tile


class AlignedPairs(NamedTuple):
    """Tile runs padded to run_chunk multiples; contiguous per tile."""

    pair_tab: jnp.ndarray  # (16, L_al) f32 packed per-pair rows, transposed
    gid: jnp.ndarray  # (L_al,) int32 original Gaussian id (P = sentinel)
    starts: jnp.ndarray  # (NTP,) int32 aligned run start per tile
    counts: jnp.ndarray  # (NTP,) int32 true (capped) run length per tile


def build_aligned_pairs(
    table: jnp.ndarray,  # (P, 16) packed per-Gaussian table (depth order)
    order: jnp.ndarray,  # (P,) depth order -> original index
    keys: jnp.ndarray,  # (L,) sorted tile keys (sentinel = big)
    pair_g: jnp.ndarray,  # (L,) depth-order Gaussian index per sorted pair
    num_tiles_pad: int,
    run_cap: int,
    run_chunk: int,
) -> AlignedPairs:
    L = keys.shape[0]
    P = table.shape[0]
    NTP = num_tiles_pad

    tids = jnp.arange(NTP, dtype=jnp.int32)
    starts = jnp.searchsorted(keys, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(keys, tids, side="right").astype(jnp.int32)
    counts = jnp.minimum(ends - starts, run_cap)

    aligned = -(-counts // run_chunk) * run_chunk
    astarts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)]
    )
    L_al = L + NTP * run_chunk  # static capacity (alignment adds < Rs/tile)

    tile_of_pair = jnp.minimum(keys, NTP - 1)
    rank = jnp.arange(L, dtype=jnp.int32) - starts[tile_of_pair]
    valid = (keys < NTP) & (rank < counts[tile_of_pair])
    dest = jnp.where(valid, astarts[tile_of_pair] + rank, L_al)

    idx_al = jnp.full(L_al + 1, P, jnp.int32).at[dest].set(pair_g)[:L_al]

    table_ext = jnp.concatenate([table, jnp.zeros((1, TABLE_LANES), table.dtype)])
    order_ext = jnp.concatenate([order.astype(jnp.int32), jnp.full(1, P, jnp.int32)])
    return AlignedPairs(
        pair_tab=table_ext[idx_al].T,  # (16, L_al), lanes = pairs
        gid=order_ext[idx_al],
        starts=astarts,
        counts=counts,
    )


def _bcast_lanes(x, rs):
    """(N, 1) -> (N, rs); Mosaic lacks implicit lane broadcast."""
    return pltpu.repeat(x, repeats=rs, axis=1)


def _cum_excl_lane(x, identity, op, rs):
    """Hillis-Steele inclusive scan along the lane axis + exclusive shift.

    x: (TPX, rs).  Returns (inclusive, exclusive)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < rs:
        rolled = pltpu.roll(acc, s, axis=1)
        acc = op(acc, jnp.where(col < s, identity, rolled))
        s *= 2
    excl = jnp.where(col < 1, identity, pltpu.roll(acc, 1, axis=1))
    return acc, excl


def _blend_kernel(
    # scalar prefetch
    starts_ref,  # (NTP,) int32 aligned starts
    counts_ref,  # (NTP,) int32 true counts
    dims_ref,  # (4,) int32: width, height, num_tiles, bg_is_white
    # inputs
    pair_tab_ref,  # (16, L_al) f32 in HBM
    mask_ref,  # (1, TPX, 1) float32 tile mask block in VMEM
    # outputs
    rgb_ref,  # (1, TPX, 3) f32
    ed_ref,  # (1, TPX, 1) f32
    einv_ref,  # (1, TPX, 1) f32
    m_ref,  # (1, L_al) f32 in HBM
    apix_ref,  # (1, L_al) i32 in HBM
    # scratch
    buf_ref,  # (16, Rs) f32
    m_scratch,  # (1, Rs) f32
    apix_scratch,  # (1, Rs) i32
    t_ref,  # (TPX, 1) f32 running transmittance
    done_ref,  # (TPX, 1) f32 (0/1) early-stop flag
    cr_ref,  # (TPX, 1) f32 colour accumulators
    cg_ref,
    cb_ref,
    eda_ref,  # (TPX, 1) f32 expected depth
    einva_ref,  # (TPX, 1) f32 expected inverse depth
    in_sem,
    out_sem,
    *,
    grid_w: int,
    width_pad: int,
    rs: int,
    max_steps: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    width = dims_ref[0]
    height = dims_ref[1]
    num_tiles = dims_ref[2]
    bg = dims_ref[3].astype(jnp.float32)

    ty = t // grid_w
    tx = t % grid_w

    # Pixel geometry: sublane s <-> (py = s // 16, px = s % 16).  Grids are
    # generated full-size from iota (Mosaic has no lane broadcast).
    sub = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0)
    sub_full = jax.lax.broadcasted_iota(jnp.int32, (TPX, rs), 0)
    gx = tx * 16 + sub % 16
    gy = ty * 16 + sub // 16
    pxf = (tx * 16 + sub_full % 16).astype(jnp.float32)  # (TPX, rs)
    pyf = (ty * 16 + sub_full // 16).astype(jnp.float32)

    valid_px = (
        (gx < width)
        & (gy < height)
        & (t < num_tiles)
        & (mask_ref[0] > 0.5)
    )  # (TPX, 1)

    # Static safety clamp: a corrupted count can never wedge the device in
    # an unbounded loop (max_steps = run_cap // rs, known at trace time).
    n_chunks = jnp.clip(
        jnp.where(count > 0, pl.cdiv(count, rs), 0), 0, max_steps
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)

    # Per-pixel running state lives in (TPX, 1) VMEM scratch refs so the
    # while loop carries only the chunk index — 2D vector loop carries hit
    # Mosaic layout-unification limits at the scf.yield.
    t_ref[:] = jnp.ones((TPX, 1), jnp.float32)
    done_ref[:] = 1.0 - valid_px.astype(jnp.float32)
    cr_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
    cg_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
    cb_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
    eda_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
    einva_ref[:] = jnp.zeros((TPX, 1), jnp.float32)

    def cond(r):
        return (r < n_chunks) & (jnp.min(done_ref[:]) < 0.5)

    def body(r):
        T = t_ref[:]  # (TPX, 1)
        done = done_ref[:] > 0.5
        off = pl.multiple_of(start + r * rs, rs)  # aligned-run guarantee
        copy = pltpu.make_async_copy(
            pair_tab_ref.at[:, pl.ds(off, rs)], buf_ref, in_sem
        )
        copy.start()
        copy.wait()

        xy_x = buf_ref[0:1, :]  # (1, Rs)
        xy_y = buf_ref[1:2, :]
        ca = buf_ref[2:3, :]
        cb = buf_ref[3:4, :]
        cc = buf_ref[4:5, :]
        opa = buf_ref[5:6, :]
        col_r = buf_ref[6:7, :]
        col_g = buf_ref[7:8, :]
        col_b = buf_ref[8:9, :]
        dep = buf_ref[9:10, :]

        dx = pxf - xy_x  # (TPX, Rs)
        dy = pyf - xy_y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))

        done_full = _bcast_lanes(done.astype(jnp.float32), rs) > 0.5
        in_run = (r * rs + lane) < count  # (1, Rs)
        ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_run & ~done_full
        a0 = jnp.where(ok, alpha, 0.0)

        _, cp_excl = _cum_excl_lane(1.0 - a0, jnp.float32(1.0), jax.lax.mul, rs)
        t_before = _bcast_lanes(T, rs) * cp_excl  # (TPX, Rs)

        trigger = ok & (t_before * (1.0 - alpha) < T_EPS)
        seen_inc, _ = _cum_excl_lane(
            trigger.astype(jnp.float32), jnp.float32(0.0), jax.lax.max, rs
        )
        allowed = seen_inc < 0.5
        a_used = jnp.where(allowed, a0, 0.0)
        w = a_used * t_before  # (TPX, Rs)

        cr_ref[:] = cr_ref[:] + jnp.sum(w * col_r, axis=1, keepdims=True)
        cg_ref[:] = cg_ref[:] + jnp.sum(w * col_g, axis=1, keepdims=True)
        cb_ref[:] = cb_ref[:] + jnp.sum(w * col_b, axis=1, keepdims=True)
        eda_ref[:] = eda_ref[:] + jnp.sum(w * dep, axis=1, keepdims=True)
        safe_dep = jnp.where(jnp.abs(dep) < 1e-12, 1e-12, dep)
        einva_ref[:] = einva_ref[:] + jnp.sum(w / safe_dep, axis=1, keepdims=True)
        # Lane reduce_prod is unsupported in Mosaic; take the full product
        # as the last column of an inclusive product scan (exact in f32,
        # unlike exp-sum-log), extracted by rolling lane rs-1 to lane 0.
        cp_used, _ = _cum_excl_lane(
            1.0 - a_used, jnp.float32(1.0), jax.lax.mul, rs
        )
        t_ref[:] = T * pltpu.roll(cp_used, 1, axis=1)[:, 0:1]
        done_ref[:] = jnp.maximum(
            done_ref[:],
            jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True),
        )

        # Per-pair max contribution + first-argmax pixel (sublane reductions).
        m = jnp.max(w, axis=0, keepdims=True)  # (1, Rs)
        cand = jnp.where((w >= m) & (m > 0.0), sub_full, jnp.int32(2**20))
        s_best = jnp.min(cand, axis=0, keepdims=True)  # (1, Rs)
        s_best = jnp.where(m > 0.0, s_best, 0)
        apix = (ty * 16 + s_best // 16) * width_pad + tx * 16 + s_best % 16
        m_scratch[:] = m
        apix_scratch[:] = apix
        mc = pltpu.make_async_copy(
            m_scratch, m_ref.at[:, pl.ds(off, rs)], out_sem
        )
        mc.start()
        mc.wait()
        ac = pltpu.make_async_copy(
            apix_scratch, apix_ref.at[:, pl.ds(off, rs)], out_sem
        )
        ac.start()
        ac.wait()

        return r + 1

    r = jax.lax.while_loop(cond, body, jnp.int32(0))

    # Chunks skipped by the early exit still need their pair slots zeroed
    # (their Gaussians are occluded: contribution 0), matching the XLA path.
    def zero_cond(r):
        return r < n_chunks

    def zero_body(r):
        off = pl.multiple_of(start + r * rs, rs)
        m_scratch[:] = jnp.zeros((1, rs), jnp.float32)
        apix_scratch[:] = jnp.zeros((1, rs), jnp.int32)
        mc = pltpu.make_async_copy(
            m_scratch, m_ref.at[:, pl.ds(off, rs)], out_sem
        )
        mc.start()
        mc.wait()
        ac = pltpu.make_async_copy(
            apix_scratch, apix_ref.at[:, pl.ds(off, rs)], out_sem
        )
        ac.start()
        ac.wait()
        return r + 1

    jax.lax.while_loop(zero_cond, zero_body, r)

    T = t_ref[:]
    rgb = jnp.concatenate(
        [
            jnp.where(valid_px, cr_ref[:] + T * bg, 0.0),
            jnp.where(valid_px, cg_ref[:] + T * bg, 0.0),
            jnp.where(valid_px, cb_ref[:] + T * bg, 0.0),
        ],
        axis=1,
    )  # (TPX, 3)
    rgb_ref[0] = rgb
    ed_ref[0] = jnp.where(valid_px, eda_ref[:], 0.0)
    einv_ref[0] = jnp.where(valid_px, einva_ref[:], 0.0)


def pallas_blend(
    pairs: AlignedPairs,
    mask_tiles: jnp.ndarray,  # (NTP, TPX) uint8
    width,
    height,
    *,
    num_tiles: int,
    num_tiles_pad: int,
    grid_w: int,
    width_pad: int,
    run_chunk: int,
    white_bkgd: bool,
    run_cap_hint: int = 1 << 16,
    interpret: bool = False,
):
    """Returns (tile_rgb (NTP,TPX,3), ed (NTP,TPX), einv (NTP,TPX),
    m (L_al,), apix (L_al,))."""
    L_al = pairs.pair_tab.shape[1]
    NTP = num_tiles_pad
    rs = run_chunk
    if rs % 128 != 0 and not interpret:
        raise ValueError(
            f"pallas blend needs run_chunk to be a multiple of 128, got {rs}"
        )

    dims = jnp.stack(
        [
            jnp.asarray(width, jnp.int32),
            jnp.asarray(height, jnp.int32),
            jnp.int32(num_tiles),
            jnp.int32(1 if white_bkgd else 0),
        ]
    )

    kernel = functools.partial(
        _blend_kernel, grid_w=grid_w, width_pad=width_pad, rs=rs,
        max_steps=max(-(-run_cap_hint // rs), 1),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NTP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # pair_tab stays in HBM
            pl.BlockSpec((1, TPX, 1), lambda t, *_: (t, 0, 0)),  # mask tile
        ],
        out_specs=[
            pl.BlockSpec((1, TPX, 3), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, TPX, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, TPX, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # m (pair-aligned, HBM)
            pl.BlockSpec(memory_space=pltpu.HBM),  # apix
        ],
        scratch_shapes=[
            pltpu.VMEM((TABLE_LANES, rs), jnp.float32),
            pltpu.VMEM((1, rs), jnp.float32),
            pltpu.VMEM((1, rs), jnp.int32),
            pltpu.VMEM((TPX, 1), jnp.float32),  # T
            pltpu.VMEM((TPX, 1), jnp.float32),  # done
            pltpu.VMEM((TPX, 1), jnp.float32),  # cr
            pltpu.VMEM((TPX, 1), jnp.float32),  # cg
            pltpu.VMEM((TPX, 1), jnp.float32),  # cb
            pltpu.VMEM((TPX, 1), jnp.float32),  # ed
            pltpu.VMEM((TPX, 1), jnp.float32),  # einv
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((NTP, TPX, 3), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, L_al), jnp.float32),
        jax.ShapeDtypeStruct((1, L_al), jnp.int32),
    ]

    rgb, ed, einv, m, apix = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        pairs.starts,
        pairs.counts,
        dims,
        pairs.pair_tab,
        mask_tiles[:, :, None].astype(jnp.float32),
    )
    return rgb, ed[:, :, 0], einv[:, :, 0], m[0], apix[0]

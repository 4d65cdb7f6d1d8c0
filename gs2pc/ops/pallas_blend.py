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
    total: jnp.ndarray  # () int32 — aligned pairs actually occupied (prefix)


_WINDOW = 1 << 20  # rows per dynamic prefix window


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
    aligned_total = jnp.sum(aligned).astype(jnp.int32)
    L_al = L + NTP * run_chunk  # static capacity (alignment adds < Rs/tile)
    W = min(_WINDOW, L_al)
    L_al = -(-L_al // W) * W  # window-aligned capacity

    tile_of_pair = jnp.minimum(keys, NTP - 1)
    rank = jnp.arange(L, dtype=jnp.int32) - starts[tile_of_pair]
    valid = (keys < NTP) & (rank < counts[tile_of_pair])
    dest = jnp.where(valid, astarts[tile_of_pair] + rank, L_al)

    idx_al = jnp.full(L_al + 1, P, jnp.int32).at[dest].set(pair_g)[:L_al]

    table_ext = jnp.concatenate([table, jnp.zeros((1, TABLE_LANES), table.dtype)])
    order_ext = jnp.concatenate([order.astype(jnp.int32), jnp.full(1, P, jnp.int32)])

    # Build the per-pair table over dynamic PREFIX WINDOWS: occupied slots
    # are a contiguous prefix [0, aligned_total), so the expensive row
    # gather touches only real pairs instead of the static capacity.
    n_win_cap = L_al // W
    tabT0 = jnp.zeros((TABLE_LANES, L_al), table.dtype)
    gid0 = jnp.full(L_al, P, jnp.int32)

    def win_cond(state):
        w = state[0]
        return (w * W < aligned_total) & (w < n_win_cap)

    def win_body(state):
        w, tabT, gid = state
        off = w * W
        idx_w = jax.lax.dynamic_slice_in_dim(idx_al, off, W)
        rows = table_ext[idx_w]  # (W, 16) gather — real pairs only
        tabT = jax.lax.dynamic_update_slice(tabT, rows.T, (0, off))
        gid = jax.lax.dynamic_update_slice(gid, order_ext[idx_w], (off,))
        return w + 1, tabT, gid

    _, pair_tab, gid = jax.lax.while_loop(
        win_cond, win_body, (jnp.int32(0), tabT0, gid0)
    )

    return AlignedPairs(
        pair_tab=pair_tab,
        gid=gid,
        starts=astarts,
        counts=counts,
        total=aligned_total,
    )


def _bcast_lanes(x, rs):
    """(N, 1) -> (N, rs); Mosaic lacks implicit lane broadcast.

    Costly (~13 us per call on v5e) — used at most once per TILE, never
    in the chunk loop (see the replicated-lane state design below).
    """
    return pltpu.repeat(x, repeats=rs, axis=1)


def _cum_excl_lane_rev(x, identity, op, rs):
    """Suffix (right-to-left) Hillis-Steele scan + exclusive shift."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < rs:
        # roll(x, -s) == roll(x, rs - s); pltpu.roll wants shift >= 0
        rolled = pltpu.roll(acc, rs - s, axis=1)
        acc = op(acc, jnp.where(col >= rs - s, identity, rolled))
        s *= 2
    excl = jnp.where(col >= rs - 1, identity, pltpu.roll(acc, rs - 1, axis=1))
    return acc, excl


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
    mask_ref,  # (TPP, TPX, 1) float32 tile mask block in VMEM
    # outputs
    rgb_ref,  # (TPP, TPX, 3) f32
    ed_ref,  # (TPP, TPX, 1) f32
    einv_ref,  # (TPP, TPX, 1) f32
    m_ref,  # (1, L_al) f32 in HBM
    apix_ref,  # (1, L_al) i32 in HBM
    # scratch
    buf_ref,  # (16, Rs) f32
    m_scratch,  # (1, Rs) f32
    apix_scratch,  # (1, Rs) i32
    t_ref,  # (TPX, Rs) f32 running transmittance (lane-replicated)
    done_ref,  # (TPX, Rs) f32 (0/1) early-stop flag (lane-replicated)
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
    tpp: int,
):
    width = dims_ref[0]
    height = dims_ref[1]
    num_tiles = dims_ref[2]
    bg = dims_ref[3].astype(jnp.float32)

    # Grid programs cost ~25-40 us of fixed overhead each (block DMAs,
    # setup); processing `tpp` tiles per program amortises it.
    prog = pl.program_id(0)

    def tile_body(k, _carry):
        t = prog * tpp + k
        start = starts_ref[t]
        count = counts_ref[t]
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
            & (mask_ref[k] > 0.5)
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
        t_ref[:] = jnp.ones((TPX, rs), jnp.float32)
        # one lane broadcast per TILE (never per chunk): replicate the
        # per-pixel validity across lanes for the running done flag
        done_ref[:] = 1.0 - _bcast_lanes(valid_px.astype(jnp.float32), rs)
        cr_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
        cg_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
        cb_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
        eda_ref[:] = jnp.zeros((TPX, 1), jnp.float32)
        einva_ref[:] = jnp.zeros((TPX, 1), jnp.float32)

        def cond(r):
            # scalar-only condition: a VMEM-read early-exit check here is
            # costly per iteration; done pixels are masked in-body instead
            return r < n_chunks

        def body(r):
            T = t_ref[:]  # (TPX, Rs), lane-replicated
            done_full = done_ref[:] > 0.5
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

            in_run = (r * rs + lane) < count  # (1, Rs)
            ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_run & ~done_full
            a0 = jnp.where(ok, alpha, 0.0)

            _, cp_excl = _cum_excl_lane(1.0 - a0, jnp.float32(1.0), jax.lax.mul, rs)
            t_before = T * cp_excl  # (TPX, Rs); T is lane-replicated

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
            # Total chunk product replicated to every lane without any
            # broadcast: forward-inclusive x suffix-exclusive product scans
            # (prod_all[j] = prod(x[:j+1]) * prod(x[j+1:]) for every j).
            cp_used_inc, _ = _cum_excl_lane(
                1.0 - a_used, jnp.float32(1.0), jax.lax.mul, rs
            )
            _, sp_used_exc = _cum_excl_lane_rev(
                1.0 - a_used, jnp.float32(1.0), jax.lax.mul, rs
            )
            t_ref[:] = T * (cp_used_inc * sp_used_exc)
            # any(trigger) replicated the same way with max scans.
            trg = trigger.astype(jnp.float32)
            trg_inc, _ = _cum_excl_lane(trg, jnp.float32(0.0), jax.lax.max, rs)
            _, trg_sexc = _cum_excl_lane_rev(trg, jnp.float32(0.0), jax.lax.max, rs)
            done_ref[:] = jnp.maximum(done_ref[:], jnp.maximum(trg_inc, trg_sexc))

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

        jax.lax.while_loop(cond, body, jnp.int32(0))

        T = jnp.min(t_ref[:], axis=1, keepdims=True)  # lanes identical
        rgb = jnp.concatenate(
            [
                jnp.where(valid_px, cr_ref[:] + T * bg, 0.0),
                jnp.where(valid_px, cg_ref[:] + T * bg, 0.0),
                jnp.where(valid_px, cb_ref[:] + T * bg, 0.0),
            ],
            axis=1,
        )  # (TPX, 3)
        rgb_ref[k] = rgb
        ed_ref[k] = jnp.where(valid_px, eda_ref[:], 0.0)
        einv_ref[k] = jnp.where(valid_px, einva_ref[:], 0.0)
        return 0

    jax.lax.fori_loop(0, tpp, tile_body, 0)


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
    # Largest tiles-per-program <= 32 that divides the padded tile count.
    tpp = 1
    for cand in range(min(32, NTP), 0, -1):
        if NTP % cand == 0:
            tpp = cand
            break

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
        max_steps=max(-(-run_cap_hint // rs), 1), tpp=tpp,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NTP // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # pair_tab stays in HBM
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),  # masks
        ],
        out_specs=[
            pl.BlockSpec((tpp, TPX, 3), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # m (pair-aligned, HBM)
            pl.BlockSpec(memory_space=pltpu.HBM),  # apix
        ],
        scratch_shapes=[
            pltpu.VMEM((TABLE_LANES, rs), jnp.float32),
            pltpu.VMEM((1, rs), jnp.float32),
            pltpu.VMEM((1, rs), jnp.int32),
            pltpu.VMEM((TPX, rs), jnp.float32),  # T (lane-replicated)
            pltpu.VMEM((TPX, rs), jnp.float32),  # done (lane-replicated)
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

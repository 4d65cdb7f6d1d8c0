"""Pallas TPU blend kernel — per-tile alpha compositing at full VPU rate.

This is the hand-optimised replacement for the XLA blend loop in
gs2pc.ops.rasterize (itself the TPU redesign of renderCUDA,
forward.cu:303-497).  Mapping:

  * one grid program per batch of 16x16 pixel tiles (CUDA: one thread
    block per tile);
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

v2 design (hardware-measured v1 overheads each get a targeted fix):

  * ALL chunk-loop state is full-width (TPX, Rs): v1's (TPX, 1) colour/
    depth accumulators forced lane-width-1 vector ops (each padded to a
    full vreg) and lane reductions in every chunk.  v2 accumulates
    w-weighted colour full-width and lane-reduces ONCE per tile.
  * the early-stop bookkeeping (trigger/seen/done scans — 5 of the 7
    Hillis-Steele scans) runs only in chunks that actually contain a
    trigger, behind a scalar `lax.cond`; a pixel triggers at most once
    per tile, so the fast path (2 scans) dominates.
  * input chunk DMAs are double-buffered (start r+1, wait r, compute r);
    per-pair outputs are packed into ONE (2, Rs) f32 slab (m + bitcast
    apix) with deferred, double-buffered output DMAs.
  * per-tile early exit when every pixel is done (CUDA's block-level
    early-out).  The pair-output HBM buffer is zero-initialised via
    input_output_aliasing so skipped chunks read as zero contribution.

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

TABLE_LANES = 16  # full row: [xy(2) conic(3) opa(1) depth(1) pad | rgb(3) pad]
# (geometry half in lanes 0-7, colour half in 8-15: built from two (P, 8)
# row gathers — see gs2pc.ops.rasterize.pack_blend_table.  Compact mode
# uses 8-lane rows with rgb packed into one exact-f32 24-bit lane.)
TPX = 256  # pixels per 16x16 tile


class AlignedPairs(NamedTuple):
    """Tile runs padded to run_chunk multiples; contiguous per tile.

    The aligned layout is REQUIRED by the kernel: Mosaic only allows HBM
    DMA slices whose lane offset is a multiple of the (8, 128) tiling, so
    every tile's run must start on a run_chunk boundary.  It is built
    scatter-free: each aligned slot GATHERS its source pair through a
    chunk -> tile map (the 16M-element scatter of the first design cost
    ~570 ms/cam at 1M Gaussians / 720p; this gather build is ~10x less)."""

    pair_tab: jnp.ndarray  # (16, L_al) f32 packed per-pair rows, transposed
    gid: jnp.ndarray  # (L_al,) int32 Gaussian id per pair (P = sentinel)
    starts: jnp.ndarray  # (NTP,) int32 aligned run start per tile
    counts: jnp.ndarray  # (NTP,) int32 true (capped) run length per tile
    total: jnp.ndarray  # () int32 — aligned pairs actually occupied (prefix)


_WINDOW = 1 << 20  # rows per dynamic prefix window


def build_aligned_pairs(
    table: jnp.ndarray,  # (P, 16) packed per-Gaussian table (ORIGINAL order)
    keys: jnp.ndarray,  # (L,) sorted tile keys (sentinel = big)
    pair_gid: jnp.ndarray,  # (L,) Gaussian id per sorted pair (P = sentinel)
    num_tiles_pad: int,
    run_cap: int,
    run_chunk: int,
    tile_live: jnp.ndarray | None = None,  # (NTP,) bool; False = skip tile
) -> AlignedPairs:
    L = keys.shape[0]
    P = table.shape[0]
    TL = table.shape[1]  # 16 (full) or 8 (compact rgb24 rows)
    NTP = num_tiles_pad
    rs = run_chunk

    tids = jnp.arange(NTP, dtype=jnp.int32)
    starts = jnp.searchsorted(keys, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(keys, tids, side="right").astype(jnp.int32)
    counts = jnp.minimum(ends - starts, run_cap)
    if tile_live is not None:
        # Tiles whose every pixel is masked out produce nothing: the
        # blend skips invalid pixels and the surface pass excludes them
        # from its min, so dropping their runs changes no image pixel,
        # contribution, or surface distance, and skips their share of the
        # table gathers, the kernel stream, and the per-pair reductions.
        # (In the packed argmax-pixel regime the dropped zero slots are
        # made inert in _pair_reduce — see the q_pairs zeroing there — so
        # the colour-sampling pixel is unchanged too, up to the
        # documented 2^-12 contribution tie band.)
        counts = jnp.where(tile_live, counts, 0)

    aligned = -(-counts // rs) * rs
    astarts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)]
    )
    aligned_total = jnp.sum(aligned).astype(jnp.int32)
    L_al = -(-(L + NTP * rs) // rs) * rs  # capacity (alignment adds < Rs/tile)
    W = min(_WINDOW, L_al)  # _WINDOW and L_al are both rs-multiples
    L_al = -(-L_al // W) * W  # window-aligned capacity

    # Chunk -> tile map (tiny: one entry per rs-wide chunk).  Aligned runs
    # are rs-multiples, so the owning tile is constant within a chunk —
    # ALL per-slot metadata is computed at chunk granularity and broadcast
    # over the rs lanes (per-element 1D gathers cost ~15 ms per million
    # slots on TPU; per-chunk they are 128x cheaper).
    chunk_base = astarts // rs  # (NTP,) first chunk id of each tile
    n_chunks_cap = L_al // rs
    # tile_of_chunk[c] = largest tile whose first chunk is <= c: a tiny
    # scatter-max at each tile's base chunk + a cummax (zero-run tiles
    # share a base; max picks the later tile, which owns the chunks) —
    # ~20x cheaper than a searchsorted over the chunk axis.
    tile_of_chunk = jnp.zeros(n_chunks_cap, jnp.int32).at[
        jnp.minimum(chunk_base, n_chunks_cap - 1)
    ].max(jnp.arange(NTP, dtype=jnp.int32))
    tile_of_chunk = jax.lax.cummax(tile_of_chunk)

    # Sentinel row P: zeros (opacity 0 — contributes nothing if ever read).
    sentinel = jnp.zeros((1, TL), table.dtype)
    table_ext = jnp.concatenate([table, sentinel])
    if TL > 8:
        # Two (P+1, 8) halves: 8-lane row gathers are ~2.8x cheaper than
        # one 16-lane gather on hardware (one sublane tile per row).
        table_geo = table_ext[:, :8]
        table_col = table_ext[:, 8:]
    # Row-major view of the sorted gids for the chunk fetch: chunk c needs
    # 128 CONSECUTIVE elements starting at src0[c], i.e. (a rotation of) two
    # adjacent rows of this view.
    # Rows needed per chunk fetch: worst-case lane offset 127 plus rs slots.
    n_fetch_rows = (rs + 127) // 128 + 1
    L_rows = -(-(L + 1) // 128) + n_fetch_rows - 1
    gid_rows = jnp.zeros((L_rows, 128), jnp.int32)
    gid_rows = jax.lax.dynamic_update_slice(
        gid_rows.reshape(-1), pair_gid, (0,)
    ).reshape(L_rows, 128)

    # Fill the aligned table over dynamic PREFIX WINDOWS: occupied slots are
    # a contiguous prefix [0, aligned_total); slot j of tile t maps to the
    # sorted pair starts[t] + rank.  Within a chunk the source pairs are
    # CONSECUTIVE, so sids are fetched with rs-wide slice gathers.
    n_win_cap = L_al // W
    CW = W // rs  # chunks per window
    # TWO 8-row carries (geometry / colour halves) in full-table mode,
    # each updated ONCE per window: a single chained second update on one
    # 16-row carry defeats XLA's in-place while_loop buffer aliasing
    # under lax.scan and every window then copies the full
    # gigabyte-scale table (a ~14x sweep regression observed on
    # hardware).  Concatenated once at the end.  Compact (8-lane) tables
    # need only ONE carry and ONE row gather per window — half the
    # build's gather and write traffic.
    tabTg0 = jnp.zeros((min(TL, 8), L_al), table.dtype)
    tabTc0 = jnp.zeros((max(TL - 8, 1), L_al), table.dtype)
    gid0 = jnp.full((L_al,), P, jnp.int32)
    lane = jnp.arange(rs, dtype=jnp.int32)

    def win_cond(state):
        w = state[0]
        return (w * W < aligned_total) & (w < n_win_cap)

    def win_body(state):
        w, tabTg, tabTc, gid_al = state
        c0 = w * CW
        ch = c0 + jnp.arange(CW, dtype=jnp.int32)
        tile_c = tile_of_chunk[ch]  # (CW,) small gathers only
        base_c = ch * rs - astarts[tile_c]  # rank of the chunk's first slot
        count_c = counts[tile_c]
        src0 = jnp.clip(starts[tile_c] + base_c, 0, L)  # run start per chunk
        # Chunk gid fetch as ROW gathers + a barrel rotate: each chunk's
        # 128 consecutive sorted gids span two adjacent 128-wide rows;
        # rotating left by src0 % 128 needs 7 select+static-roll rounds —
        # ~10x cheaper than a per-element gather (which runs at ~9 ms/M)
        # and ~4x cheaper than a vmap of dynamic_slices (serial loop).
        q = src0 // 128
        wide = jnp.concatenate(
            [gid_rows[q + i] for i in range(n_fetch_rows)], axis=1
        )  # (CW, >= rs + 128)
        shift = src0 % 128
        for bit in (64, 32, 16, 8, 4, 2, 1):
            rolled = jnp.roll(wide, -bit, axis=1)
            wide = jnp.where((shift & bit)[:, None] != 0, rolled, wide)
        runs = wide[:, :rs]
        valid = (base_c[:, None] + lane[None, :]) < count_c[:, None]
        gid_w = jnp.where(valid, runs, P).reshape(W)
        safe = jnp.minimum(gid_w, P)
        if TL > 8:
            rows_geo = table_geo[safe]  # (W, 8) row gathers (2x cheap halves)
            rows_col = table_col[safe]
            tabTg = jax.lax.dynamic_update_slice(
                tabTg, rows_geo.T, (0, w * W)
            )
            tabTc = jax.lax.dynamic_update_slice(
                tabTc, rows_col.T, (0, w * W)
            )
        else:
            rows = table_ext[safe]  # (W, 8): ONE row gather per pair
            tabTg = jax.lax.dynamic_update_slice(tabTg, rows.T, (0, w * W))
        gid_al = jax.lax.dynamic_update_slice(gid_al, gid_w, (w * W,))
        return w + 1, tabTg, tabTc, gid_al

    _, tabTg, tabTc, gid_al = jax.lax.while_loop(
        win_cond, win_body, (jnp.int32(0), tabTg0, tabTc0, gid0)
    )
    pair_tab = (
        jnp.concatenate([tabTg, tabTc], axis=0) if TL > 8 else tabTg
    )

    return AlignedPairs(
        pair_tab=pair_tab,
        gid=gid_al,
        starts=astarts,
        counts=counts,
        total=aligned_total,
    )


def _lane_bcast_last(x, rs):
    """Broadcast the last lane across all lanes ((TPX, rs) -> (TPX, rs)).

    Replaces the v2 suffix-scan trick for lane-replicating a full-chunk
    reduction: for an INCLUSIVE scan `inc`, inc[:, -1] already holds the
    whole-chunk fold, and one slice+broadcast costs ~2 vector ops where
    the suffix scan cost log2(rs) roll+select+op rounds (~21 ops at
    rs=128 — over a quarter of the fast path's VPU work)."""
    return jnp.broadcast_to(x[:, rs - 1 : rs], x.shape)


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
    starts_ref,  # (NTP,) int32 run starts (sorted-pair order)
    counts_ref,  # (NTP,) int32 true counts
    dims_ref,  # (4,) int32: width, height, num_tiles, bg_is_white
    # inputs
    pair_tab_ref,  # (16, L_al) f32 in HBM
    gid_in_ref,  # (1, L_al) i32 in HBM — aligned per-pair Gaussian ids
    mask_ref,  # (TPP, TPX, 1) float32 tile mask block in VMEM
    t0_ref,  # (TPP, TPX, 1) f32 initial per-pixel transmittance block
    edov_ref,  # (TPP, TPX, 1) f32 expected-depth override block
    ma_in_ref,  # (2, L_al) f32 in HBM — zero-init, ALIASED to ma_ref
    cgid_in_ref,  # (1, L_al) i32 in HBM — sentinel init, ALIASED to cgid_ref
    # outputs
    rgb_ref,  # (TPP, TPX, 3) f32
    ed_ref,  # (TPP, TPX, 1) f32
    einv_ref,  # (TPP, TPX, 1) f32
    tout_ref,  # (TPP, TPX, 1) f32 final per-pixel transmittance
    ma_ref,  # (2, L_al) f32 in HBM: COMPACT stream — row 0 = max
    # contribution, row 1 = bitcast argmax pixel (see cursor note below)
    cgid_ref,  # (1, L_al) i32 in HBM: COMPACT per-pair Gaussian ids
    sd_ref,  # (1, L_al) f32 in HBM: per-pair min surface distance (if with_surface)
    live_ref,  # (TPP, TPX, 1) f32: final T where the pixel is valid AND not done, else 0
    total_ref,  # (1,) i32 in SMEM: compact occupied length (final cursor)
    # scratch
    buf_ref,  # (2, 16, Rs) f32 — double-buffered input chunk slabs
    ma_scratch,  # (2, 2, Rs) f32 — double-buffered packed pair outputs
    sd_scratch,  # (2, 1, Rs) f32 — double-buffered surface-distance outputs
    t_ref,  # (TPX, Rs) f32 running transmittance (lane-replicated)
    done_ref,  # (TPX, Rs) f32 (0/1) early-stop flag (lane-replicated)
    accr_ref,  # (TPX, Rs) f32 full-width colour accumulators
    accg_ref,
    accb_ref,
    accd_ref,  # (TPX, Rs) f32 expected depth
    acci_ref,  # (TPX, Rs) f32 expected inverse depth
    cursor_ref,  # (1,) i32 SMEM — compact-stream cursor, persists across programs
    in_sems,  # DMA semaphores (2,)
    out_sems,  # DMA semaphores (2,)
    gid_sems,  # DMA semaphores (2,) for the gid HBM->HBM copies
    *,
    grid_w: int,
    width_pad: int,
    rs: int,
    max_steps: int,
    tpp: int,
    with_surface: bool,
    surface_compact: bool,
    early_stop: bool,
    use_init_trans: bool,
    use_ed_override: bool,
    compact: bool,
):
    width = dims_ref[0]
    height = dims_ref[1]
    num_tiles = dims_ref[2]
    bg = dims_ref[3].astype(jnp.float32)

    # Grid programs cost ~25-40 us of fixed overhead each (block DMAs,
    # setup); processing `tpp` tiles per program amortises it.
    prog = pl.program_id(0)

    # COMPACT pair-output stream: per-pair (m, apix, gid) slabs are
    # appended at a global cursor, one Rs-chunk per chunk the blend loop
    # ACTUALLY streamed — chunks skipped by the per-tile early exit
    # produce nothing (their m would be all-zero, which the post
    # reductions treat as inert), so the post-pass scatters scan only
    # the streamed prefix instead of the full aligned capacity.  On an
    # opaque capture most tiles early-exit after a few chunks, so this
    # shrinks the reduction domain several-fold.  The TPU grid is
    # sequential on a core, so a single SMEM cursor is race-free.
    @pl.when(prog == 0)
    def _():
        cursor_ref[0] = 0

    def tile_body(k, _carry):
        t = prog * tpp + k
        start = starts_ref[t]
        count = counts_ref[t]
        ty = t // grid_w
        tx = t % grid_w

        # Pixel geometry: sublane s <-> (py = s // 16, px = s % 16).
        sub = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (TPX, rs), 0)
        gx = tx * 16 + sub % 16  # (TPX, 1)
        gy = ty * 16 + sub // 16
        gx_full = tx * 16 + sub_full % 16  # (TPX, rs)
        gy_full = ty * 16 + sub_full // 16
        pxf = gx_full.astype(jnp.float32)
        pyf = gy_full.astype(jnp.float32)

        mask_col = mask_ref[k] > 0.5  # (TPX, 1)
        valid_px = (
            (gx < width) & (gy < height) & (t < num_tiles) & mask_col
        )  # (TPX, 1) — final writeback mask
        # Full-width validity: geometric part comes straight from iota;
        # the mask column lane-broadcasts (one elementwise op per tile).
        valid_full = (
            (gx_full < width) & (gy_full < height) & (t < num_tiles) & mask_col
        )  # (TPX, rs)
        done0 = jnp.where(valid_full, 0.0, 1.0)

        # Static safety clamp: a corrupted count can never wedge the device in
        # an unbounded loop (max_steps = run_cap // rs, known at trace time).
        n_chunks = jnp.clip(
            jnp.where(count > 0, pl.cdiv(count, rs), 0), 0, max_steps
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)

        if use_init_trans:
            # Seed the per-pixel transmittance from the upstream depth
            # slabs' product (gauss-axis sharded renderer, pass 2).
            t_ref[:] = t0_ref[k] * jnp.ones((TPX, rs), jnp.float32)
        else:
            t_ref[:] = jnp.ones((TPX, rs), jnp.float32)
        done_ref[:] = done0
        zeros_full = jnp.zeros((TPX, rs), jnp.float32)
        accr_ref[:] = zeros_full
        accg_ref[:] = zeros_full
        accb_ref[:] = zeros_full
        accd_ref[:] = zeros_full
        acci_ref[:] = zeros_full

        alldone0 = jnp.min(done0) > 0.5
        # Compact-stream base for THIS tile: the blend loop appends its
        # streamed chunks at consecutive cursor offsets starting here, so
        # the surface pass (surface_compact mode) can mirror chunk r of
        # the tile to compact slot coff0 + r*rs.
        coff0 = cursor_ref[0]

        def in_dma(slot, r):
            off = pl.multiple_of(start + r * rs, rs)  # aligned-run guarantee
            return pltpu.make_async_copy(
                pair_tab_ref.at[:, pl.ds(off, rs)],
                buf_ref.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, coff):
            # Destination = compact-cursor offset (always an rs multiple).
            # Waits reconstruct the descriptor with offset 0: the wait
            # only consumes the semaphore by the copy's byte count, which
            # is offset-independent.
            off = pl.multiple_of(coff, rs)
            return pltpu.make_async_copy(
                ma_scratch.at[slot],
                ma_ref.at[:, pl.ds(off, rs)],
                out_sems.at[slot],
            )

        def gid_dma(slot, r, coff):
            # Straight HBM->HBM copy of the chunk's gid slab into the
            # compact stream (the values pass through unchanged).
            src = pl.multiple_of(start + r * rs, rs)
            dst = pl.multiple_of(coff, rs)
            return pltpu.make_async_copy(
                gid_in_ref.at[:, pl.ds(src, rs)],
                cgid_ref.at[:, pl.ds(dst, rs)],
                gid_sems.at[slot],
            )

        @pl.when((n_chunks > 0) & jnp.logical_not(alldone0))
        def _():
            in_dma(0, 0).start()

        def cond(state):
            r, alldone = state
            return (r < n_chunks) & jnp.logical_not(alldone)

        def body(state):
            r, _ = state
            slot = jax.lax.rem(r, 2)

            @pl.when(r + 1 < n_chunks)
            def _():
                in_dma(1 - slot, r + 1).start()

            in_dma(slot, r).wait()

            xy_x = buf_ref[slot, 0:1, :]  # (1, Rs)
            xy_y = buf_ref[slot, 1:2, :]
            ca = buf_ref[slot, 2:3, :]
            cb = buf_ref[slot, 3:4, :]
            cc = buf_ref[slot, 4:5, :]
            opa = buf_ref[slot, 5:6, :]
            dep = buf_ref[slot, 6:7, :]
            if compact:
                # rgb24 lane: exact 24-bit integer carried in f32.
                vi = buf_ref[slot, 7:8, :].astype(jnp.int32)
                inv255 = jnp.float32(1.0 / 255.0)
                col_r = ((vi >> 16) & 255).astype(jnp.float32) * inv255
                col_g = ((vi >> 8) & 255).astype(jnp.float32) * inv255
                col_b = (vi & 255).astype(jnp.float32) * inv255
            else:
                col_r = buf_ref[slot, 8:9, :]
                col_g = buf_ref[slot, 9:10, :]
                col_b = buf_ref[slot, 10:11, :]

            T = t_ref[:]  # (TPX, Rs), lane-replicated
            done_full = done_ref[:] > 0.5

            dx = pxf - xy_x  # (TPX, Rs)
            dy = pyf - xy_y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))

            in_run = (r * rs + lane) < count  # (1, Rs)
            ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_run & ~done_full
            a0 = jnp.where(ok, alpha, 0.0)

            cp_inc, cp_excl = _cum_excl_lane(
                1.0 - a0, jnp.float32(1.0), jax.lax.mul, rs
            )
            t_before = T * cp_excl  # (TPX, Rs)
            if early_stop:
                trigger = ok & (t_before * (1.0 - alpha) < T_EPS)
                anytrig = jnp.max(jnp.where(trigger, 1.0, 0.0))
            else:
                # Trigger-free mode (gauss-shard pass 1): the carried T must
                # be the exact product over every pair, so the T_EPS stop
                # never fires and the fast path is statically selected.
                trigger = jnp.zeros_like(ok)
                anytrig = jnp.float32(0.0)

            def fast(_):
                # No trigger in this chunk: every ok pair contributes and
                # the done flags are unchanged.  The chunk's total product
                # is the inclusive scan's last lane, broadcast.
                w = a0 * t_before
                t_new = T * _lane_bcast_last(cp_inc, rs)
                return w, t_new, done_ref[:]

            def slow(_):
                # Exact CUDA early-stop semantics: everything at or after
                # the first trigger per pixel is masked out.
                seen_inc, _ = _cum_excl_lane(
                    trigger.astype(jnp.float32), jnp.float32(0.0), jax.lax.max, rs
                )
                allowed = seen_inc < 0.5
                a_used = jnp.where(allowed, a0, 0.0)
                w = a_used * t_before
                cpu_inc, _ = _cum_excl_lane(
                    1.0 - a_used, jnp.float32(1.0), jax.lax.mul, rs
                )
                t_new = T * _lane_bcast_last(cpu_inc, rs)
                # A pixel that triggered ANYWHERE in the chunk is done for
                # all later chunks (lane-invariant any = scan's last lane).
                done_new = jnp.maximum(
                    done_ref[:], _lane_bcast_last(seen_inc, rs)
                )
                return w, t_new, done_new

            if early_stop:
                w, t_new, done_new = jax.lax.cond(anytrig > 0.0, slow, fast, 0)
            else:
                w, t_new, done_new = fast(0)
            t_ref[:] = t_new
            done_ref[:] = done_new

            # Full-width accumulation (lane-reduced once per tile, after the
            # loop) — no width-1 vector ops inside the chunk loop.
            inv_dep = 1.0 / jnp.where(jnp.abs(dep) < 1e-12, 1e-12, dep)
            accr_ref[:] = accr_ref[:] + w * col_r
            accg_ref[:] = accg_ref[:] + w * col_g
            accb_ref[:] = accb_ref[:] + w * col_b
            accd_ref[:] = accd_ref[:] + w * dep
            acci_ref[:] = acci_ref[:] + w * inv_dep

            # Per-pair max contribution + first-argmax pixel (sublane
            # reductions), packed into one slab: row 0 = m, row 1 = pixel id
            # bitcast to f32 so a single DMA carries both.
            m = jnp.max(w, axis=0, keepdims=True)  # (1, Rs)
            cand = jnp.where((w >= m) & (m > 0.0), sub_full, jnp.int32(2**20))
            s_best = jnp.min(cand, axis=0, keepdims=True)  # (1, Rs)
            s_best = jnp.where(m > 0.0, s_best, 0)
            apix = (ty * 16 + s_best // 16) * width_pad + tx * 16 + s_best % 16

            @pl.when(r >= 2)
            def _():
                out_dma(slot, 0).wait()
                gid_dma(slot, 0, 0).wait()

            coff = cursor_ref[0]
            ma_scratch[slot, 0:1, :] = m
            ma_scratch[slot, 1:2, :] = pltpu.bitcast(apix, jnp.float32)
            out_dma(slot, coff).start()
            gid_dma(slot, r, coff).start()
            cursor_ref[0] = coff + rs

            alldone = jnp.min(done_new) > 0.5
            return r + 1, alldone

        r_fin, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), alldone0))

        # Drain in-flight DMAs before the next tile reuses the slots.
        @pl.when(r_fin >= 2)
        def _():
            out_dma(jax.lax.rem(r_fin, 2), 0).wait()
            gid_dma(jax.lax.rem(r_fin, 2), 0, 0).wait()

        @pl.when(r_fin >= 1)
        def _():
            out_dma(jax.lax.rem(r_fin - 1, 2), 0).wait()
            gid_dma(jax.lax.rem(r_fin - 1, 2), 0, 0).wait()

        @pl.when((r_fin >= 1) & (r_fin < n_chunks))
        def _():
            # Early exit left the prefetched input chunk in flight.
            in_dma(jax.lax.rem(r_fin, 2), r_fin).wait()

        T = jnp.min(t_ref[:], axis=1, keepdims=True)  # lanes identical
        cr = jnp.sum(accr_ref[:], axis=1, keepdims=True)  # (TPX, 1)
        cg = jnp.sum(accg_ref[:], axis=1, keepdims=True)
        cb_ = jnp.sum(accb_ref[:], axis=1, keepdims=True)
        ed = jnp.sum(accd_ref[:], axis=1, keepdims=True)
        einv = jnp.sum(acci_ref[:], axis=1, keepdims=True)
        rgb = jnp.concatenate(
            [
                jnp.where(valid_px, cr + T * bg, 0.0),
                jnp.where(valid_px, cg + T * bg, 0.0),
                jnp.where(valid_px, cb_ + T * bg, 0.0),
            ],
            axis=1,
        )  # (TPX, 3)
        rgb_ref[k] = rgb
        ed_ref[k] = jnp.where(valid_px, ed, 0.0)
        einv_ref[k] = jnp.where(valid_px, einv, 0.0)
        # Final transmittance map (neutral 1 on invalid pixels so the
        # gauss-shard cross-device prefix products stay well-defined).
        tout_ref[k] = jnp.where(valid_px, T, 1.0)
        # Live-pixel transmittance: 0 where the pixel is invalid OR hit
        # the early stop — a truncated pair can only have mattered on a
        # pixel that was still blending (truncation observability).
        done_col = jnp.max(done_ref[:], axis=1, keepdims=True) > 0.5
        live_ref[k] = jnp.where(valid_px & ~done_col, T, 0.0)

        if with_surface:
            # Second cheap chunk loop: min over tile pixels of
            # |pair depth - expected depth| (renderCUDA's optional surface
            # pass, forward.cu:460-477) re-using the in-VMEM expected depth
            # — a DMA-bound sweep, ~6 ops per (TPX, Rs) chunk.
            # surface_compact mode reproduces the reference's block-level
            # break (forward.cu:369-371 exits the WHOLE batch loop,
            # surface pass included, once every pixel is done): only the
            # r_fin chunks the blend actually streamed are swept, and
            # their sd slabs land in the COMPACT stream at this tile's
            # cursor base, so the post reduction reads (cgid, sd) over
            # [0, total) instead of the full aligned capacity.  Full mode
            # sweeps every chunk and writes aligned-order slots.
            big = jnp.float32(3.4028235e38)
            n_surf = r_fin if surface_compact else n_chunks
            # The distance target: this tile's blended expected depth, or
            # the externally supplied (globally combined) map when the
            # gauss-shard renderer re-runs the surface pass (pass 3).
            ed_target = edov_ref[k] if use_ed_override else ed

            def sd_dma(slot, r):
                if surface_compact:
                    off = pl.multiple_of(coff0 + r * rs, rs)
                else:
                    off = pl.multiple_of(start + r * rs, rs)
                return pltpu.make_async_copy(
                    sd_scratch.at[slot],
                    sd_ref.at[:, pl.ds(off, rs)],
                    out_sems.at[slot],
                )

            @pl.when(n_surf > 0)
            def _():
                in_dma(0, 0).start()

            def s_cond(r):
                return r < n_surf

            def s_body(r):
                slot = jax.lax.rem(r, 2)

                @pl.when(r + 1 < n_surf)
                def _():
                    in_dma(1 - slot, r + 1).start()

                in_dma(slot, r).wait()
                dep = buf_ref[slot, 6:7, :]  # (1, Rs)
                dist = jnp.abs(dep - ed_target)  # (TPX, Rs), two-way broadcast
                dist = jnp.where(valid_full, dist, big)
                s_in_run = (r * rs + lane) < count
                sd = jnp.min(dist, axis=0, keepdims=True)  # (1, Rs)
                sd = jnp.where(s_in_run, sd, big)

                @pl.when(r >= 2)
                def _():
                    sd_dma(slot, r - 2).wait()

                sd_scratch[slot] = sd
                sd_dma(slot, r).start()
                return r + 1

            s_fin = jax.lax.while_loop(s_cond, s_body, jnp.int32(0))

            @pl.when(s_fin >= 2)
            def _():
                sd_dma(jax.lax.rem(s_fin, 2), s_fin - 2).wait()

            @pl.when(s_fin >= 1)
            def _():
                sd_dma(jax.lax.rem(s_fin - 1, 2), s_fin - 1).wait()

        return 0

    jax.lax.fori_loop(0, tpp, tile_body, 0)
    # Every program publishes the running cursor; the grid is sequential,
    # so the last program leaves the final compact length.
    total_ref[0] = cursor_ref[0]


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
    with_surface: bool = False,
    surface_compact: bool = False,
    interpret: bool = False,
    init_trans_tiles: jnp.ndarray | None = None,  # (NTP, TPX) f32
    ed_override_tiles: jnp.ndarray | None = None,  # (NTP, TPX) f32
    early_stop: bool = True,
):
    """Returns (tile_rgb (NTP,TPX,3), ed (NTP,TPX), einv (NTP,TPX),
    trans (NTP,TPX), m (L_al,), apix (L_al,), gid (L_al,), total (),
    sd (L_al,) or None, live (NTP,TPX)).

    (m, apix, gid) form the COMPACT pair-output stream: only chunks the
    blend loop actually streamed occupy the prefix [0, total); the tail
    is inert (m = 0, gid = sentinel).  ``sd`` ordering depends on
    ``surface_compact``: True -> sd rides the SAME compact stream (slot i
    pairs with gid[i]; chunks past the reference's block-level early
    exit, forward.cu:369-371, are excluded from the surface min); False
    -> ALIGNED pair order over [0, aligned_total) with the surface pass
    sweeping every chunk regardless of the blend's early exit."""
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

    tl = pairs.pair_tab.shape[0]  # 16 (full) or 8 (compact rgb24)
    kernel = functools.partial(
        _blend_kernel, grid_w=grid_w, width_pad=width_pad, rs=rs,
        max_steps=max(-(-run_cap_hint // rs), 1), tpp=tpp,
        with_surface=with_surface,
        surface_compact=surface_compact,
        early_stop=early_stop,
        use_init_trans=init_trans_tiles is not None,
        use_ed_override=ed_override_tiles is not None,
        compact=tl == 8,
    )

    # Unused optional blocks are fed as cheap dummies: the block DMA per
    # program is ~tpp*256*4 bytes, noise next to the pair streams.
    if init_trans_tiles is None:
        init_trans_tiles = jnp.ones((NTP, TPX), jnp.float32)
    if ed_override_tiles is None:
        ed_override_tiles = jnp.zeros((NTP, TPX), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NTP // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # pair_tab stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # aligned gid (HBM)
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),  # masks
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),  # t0
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),  # ed ovr
            pl.BlockSpec(memory_space=pltpu.HBM),  # ma zero-init (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cgid sentinel (aliased)
        ],
        out_specs=[
            pl.BlockSpec((tpp, TPX, 3), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),  # trans
            pl.BlockSpec(memory_space=pltpu.HBM),  # compact m/apix (HBM)
            pl.BlockSpec(memory_space=pltpu.HBM),  # compact gid (HBM)
            pl.BlockSpec(memory_space=pltpu.HBM),  # sd (HBM; dummy if unused)
            pl.BlockSpec((tpp, TPX, 1), lambda p, *_: (p, 0, 0)),  # live T
            pl.BlockSpec(memory_space=pltpu.SMEM),  # compact total
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tl, rs), jnp.float32),  # input slabs
            pltpu.VMEM((2, 2, rs), jnp.float32),  # packed pair outputs
            pltpu.VMEM((2, 1, rs), jnp.float32),  # surface-distance slabs
            pltpu.VMEM((TPX, rs), jnp.float32),  # T (lane-replicated)
            pltpu.VMEM((TPX, rs), jnp.float32),  # done (lane-replicated)
            pltpu.VMEM((TPX, rs), jnp.float32),  # acc r
            pltpu.VMEM((TPX, rs), jnp.float32),  # acc g
            pltpu.VMEM((TPX, rs), jnp.float32),  # acc b
            pltpu.VMEM((TPX, rs), jnp.float32),  # acc depth
            pltpu.VMEM((TPX, rs), jnp.float32),  # acc invdepth
            pltpu.SMEM((1,), jnp.int32),  # compact-stream cursor
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((NTP, TPX, 3), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((2, L_al), jnp.float32),
        jax.ShapeDtypeStruct((1, L_al), jnp.int32),
        jax.ShapeDtypeStruct((1, L_al if with_surface else rs), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    ]

    ma_init = jnp.zeros((2, L_al), jnp.float32)
    # cgid tail init: the sentinel row (P) of the per-Gaussian tables is
    # the reduce's dump slot; gid values themselves never exceed P.
    cgid_init = jnp.full((1, L_al), jnp.int32(2**31 - 1), jnp.int32)

    rgb, ed, einv, trans, ma, cgid, sd, live, total = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # Inputs are [starts, counts, dims, pair_tab, gid, mask, t0, edov,
        # ma_init, cgid_init]; aliasing zero/sentinel-fills the compact
        # stream's tail beyond the final cursor (never read by the post
        # reductions, but must stay inert).
        input_output_aliases={8: 4, 9: 5},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        pairs.starts,
        pairs.counts,
        dims,
        pairs.pair_tab,
        pairs.gid.reshape(1, L_al),
        mask_tiles[:, :, None].astype(jnp.float32),
        init_trans_tiles[:, :, None].astype(jnp.float32),
        ed_override_tiles[:, :, None].astype(jnp.float32),
        ma_init,
        cgid_init,
    )
    m = ma[0]
    apix = jax.lax.bitcast_convert_type(ma[1], jnp.int32)
    sd_out = sd[0] if with_surface else None
    return (
        rgb, ed[:, :, 0], einv[:, :, 0], trans[:, :, 0], m, apix,
        cgid[0], total[0], sd_out, live[:, :, 0],
    )

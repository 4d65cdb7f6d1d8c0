"""Tile-binned splat rasterizer — the production TPU renderer.

This is the TPU-native redesign of the reference's CUDA rasterizer core
(cuda_rasterizer/rasterizer_impl.cu:197-352, forward.cu:153-497).  The CUDA
pipeline is: preprocess -> prefix-sum -> duplicateWithKeys -> radix sort on
[tileID|depth] 64-bit keys -> identifyTileRanges -> per-tile blend with
shared-memory batches and CAS-loop float atomics for per-Gaussian maxima.

TPU mapping (all fixed shapes, no atomics):

1.  preprocess: vectorised jnp over the Gaussian axis (ops/projection.py).
2.  sort key = (tile, depth-bits, gid): positive-f32 depth bits are
    order-isomorphic to depth — the CUDA 64-bit [tileID|depth] key split
    across sort operands (no depth argsort, no reorder pass).
3.  EXACT pair expansion on a static budget: per-Gaussian tile counts are
    waterfilled to fit the pair budget L (full rects whenever the scene's
    total coverage fits — the common case — so the emitted pair set then
    EQUALS duplicateWithKeys'), offsets are a prefix sum, and pair j
    recovers (gaussian, tile) with a scatter-index + running-max and a
    window decode.  Oversubscribed scenes degrade uniformly (every
    Gaussian keeps the tiles nearest its centre) and the loss is counted
    and reported (the reference has no cap and instead OOM-retries).
4.  stable lax.sort by int32 tile key -> per-tile contiguous runs;
    searchsorted yields (start, count) per tile — CUDA's identifyTileRanges.
5.  blend: scan over tile batches x run chunks; each step blends a
    (tile_batch, 256 px, run_chunk) block with exact CUDA alpha/early-stop
    semantics (ops/blend.py).  Colour accumulation is an MXU matmul.
6.  per-Gaussian (max contribution, argmax pixel) and min surface distance
    become windowed scatter-max/min reductions over emitted per-pair
    values — max/min are exactly associative, so collision order cannot
    change results, deterministic where the CUDA kernel raced
    (forward.cu:463-471).

Per-tile runs are capped at R_cap *front-to-back*: beyond a few thousand
front Gaussians, transmittance is ~0 and the CUDA kernel would have
early-exited anyway, so the dropped tail is invisible.
"""

from __future__ import annotations


import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gs2pc.ops.blend import FLOAT_MAX, RenderOutput, blend_chunk, init_carry
from gs2pc.ops.projection import preprocess

_KEY_SENTINEL = 2**30  # tile-key sentinel (plain int: no device alloc at import)


class TileConfig(NamedTuple):
    """Static rasterizer geometry (all Python ints at trace time)."""

    width_pad: int
    height_pad: int
    tile: int = 16
    slots: int = 16  # legacy budget input: see pair_budget_for
    slots_small: int = 4  # legacy budget input: see pair_budget_for
    big_cap: int = 0  # legacy budget input (0 = P // 4): see pair_budget_for
    pair_budget: int = 0  # L: static splat-tile pair capacity (0 = derive)
    run_cap: int = 4096  # R_cap: max pairs blended per tile
    run_chunk: int = 128  # Rs: pairs per inner step
    tile_batch: int = 256  # TB: tiles per outer step
    # Q: per-Gaussian windows pad to a multiple of this many pairs, so the
    # pair -> Gaussian decode (scatter+cummax+row gather) runs at 1/Q
    # granularity — the expansion's dominant cost at production scale
    # (DESIGN.md §7a).  Pads are dead pairs (sentinel keys); whenever the
    # budget covers the padded coverage the LIVE pair set is identical to
    # Q=1, so results are unchanged.  1 = no padding.  Default 4: decode
    # is ~1.9x faster than Q=1 on hardware while window padding stays
    # ~15-25% on detail-splat scenes (Q=8 is faster per pair but its
    # ~50%+ padding can double the power-of-two budget bucket).
    pair_quantum: int = 4
    # Compact 8-lane blend-table rows: rgb quantizes to 8 bits per channel
    # (one exact-f32 24-bit lane), halving the per-pair gather/DMA traffic
    # of the aligned build and the blend kernel.  Output colours are
    # written as u8 anyway (gauss_dataloader.py:118 layout), so the
    # <=0.5/255 pre-blend rounding is below the writer's own rounding;
    # exact-f32 mode remains for oracle parity (tests pin the compact
    # image within 1.5/255 of exact).  Production config default is ON
    # (RenderConfig.compact_pairs); raw TileConfig defaults OFF so parity
    # harnesses stay bit-exact.
    compact: bool = False
    # Surface-distance early-exit compaction: the reference kernel breaks
    # out of the ENTIRE per-tile batch loop — surface pass included — the
    # moment every pixel in the block is done (forward.cu:369-371), so
    # pairs in batches past that point never enter the surface min.  When
    # True, both blend paths reproduce that break at run_chunk
    # granularity: the surface min only sees chunks the blend actually
    # streamed (Pallas additionally rides the compact pair-output stream,
    # shrinking the kernel's surface DMA sweep and the post scatter
    # domain several-fold on opaque scenes).  When False (raw default),
    # the surface min covers every capped run pair — the semantics the
    # dense renderer and the legacy oracle mode pin.  Production config
    # default is ON (RenderConfig.surface_compact).
    surface_compact: bool = False

    def pair_budget_for(self, p: int) -> int:
        """Static pair-list length for a P-Gaussian scene.

        ``pair_budget`` wins when set; otherwise the budget is derived from
        the legacy window knobs (P*slots_small + big_cap*slots — the exact
        pair-list length the old two-class window expansion produced), so
        raising those knobs still buys capacity."""
        if self.pair_budget > 0:
            return max(self.pair_budget, p)
        b_cap = self.big_cap if self.big_cap > 0 else max(p // 4, 256)
        return p * min(self.slots_small, self.slots) + min(b_cap, p) * self.slots

    @property
    def grid_w(self) -> int:
        return self.width_pad // self.tile

    @property
    def grid_h(self) -> int:
        return self.height_pad // self.tile

    @property
    def num_tiles(self) -> int:
        return self.grid_w * self.grid_h

    @property
    def num_tiles_pad(self) -> int:
        tb = min(self.tile_batch, max(self.num_tiles, 1))
        return -(-self.num_tiles // tb) * tb

    @property
    def tile_batch_eff(self) -> int:
        return min(self.tile_batch, max(self.num_tiles, 1))


def _win_dims(rw, rh, s_cap):
    """Aspect-following window dims holding at most s_cap tiles.

    The window is as wide as the rect allows (up to s_cap), then as tall
    as the remaining budget allows; kept area is monotone nondecreasing
    in s_cap, which the waterfill binary search relies on.  s_cap may be
    a traced scalar."""
    s_w = jnp.clip(rw, 1, s_cap)
    s_h = jnp.clip(jnp.minimum(rh, s_cap // jnp.maximum(s_w, 1)), 1, s_cap)
    return s_w, s_h


def _waterfill_cap(rw, rh, ok_g, budget: int, grid_area: int, quantum: int = 1):
    """Largest uniform per-Gaussian tile cap whose kept area fits budget.

    The CUDA pipeline expands EXACT per-Gaussian tile counts via a prefix
    sum (duplicateWithKeys, rasterizer_impl.cu:69-110) into a dynamically
    sized pair list; on TPU the list length is a static budget L, so the
    per-Gaussian counts are waterfilled: every Gaussian keeps a window of
    at most s_cap tiles, with s_cap the largest value whose total kept
    area fits L.  When the scene's total rect area fits the budget the
    expansion is EXACT (full rects, reference semantics, zero
    truncation); oversubscribed scenes degrade uniformly instead of
    per-class, and the loss is counted and reported.  ``quantum`` adds
    the Q-pair window padding to the fit (see TileConfig.pair_quantum)."""

    def kept_sum(s):
        s_w, s_h = _win_dims(rw, rh, s)
        kept = s_w * s_h
        if quantum > 1:
            kept = -(-kept // quantum) * quantum
        # f32 sum: exact ints only below 2^24, so leave slack below the
        # budget for rounding; the offset cumsum clamps exactly anyway.
        return jnp.sum(jnp.where(ok_g, kept.astype(jnp.float32), 0.0))

    # Slack for f32 rounding in kept_sum (XLA reduces in trees: relative
    # error ~ eps * log2(N)); the offset cumsum clamps exactly anyway.
    budget_f = jnp.float32(budget) - (64.0 + budget * 1e-5)
    lo = jnp.int32(1)
    hi = jnp.int32(grid_area)
    for _ in range(max(1, math.ceil(math.log2(max(grid_area, 2)))) + 1):
        mid = (lo + hi + 1) // 2
        fits = kept_sum(mid) <= budget_f
        lo = jnp.where(fits, mid, lo)
        hi = jnp.where(fits, hi, mid - 1)
    return lo


def coverage_need(
    scene_arrays, cameras, cfg: TileConfig,
    calc_surface_distance: bool = True, antialiasing: bool = False,
):
    """Max per-camera splat-tile coverage — the exact pair-list length a
    full expansion needs (what CUDA's prefix sum allocates dynamically,
    rasterizer_impl.cu:297-322).  Preprocess-only and cheap (no
    expansion, no sort): jit it host-side once to size
    TileConfig.pair_budget before tracing the sweep."""
    import dataclasses as _dc

    means, cov_factors, opacities, _, alive = scene_arrays

    def one(carry, cam):
        prep = preprocess(
            means, cov_factors, opacities, alive,
            cam.viewmatrix, cam.projmatrix, cam.tanfovx, cam.tanfovy,
            cam.focal_x, cam.focal_y, cam.width, cam.height,
            tile=cfg.tile, antialiasing=antialiasing,
            adaptive_radius=not calc_surface_distance,
        )
        rw = prep.rect_max[:, 0] - prep.rect_min[:, 0]
        rh = prep.rect_max[:, 1] - prep.rect_min[:, 1]
        ok = prep.valid & (rw > 0) & (rh > 0)
        area = rw * rh
        if cfg.pair_quantum > 1:  # window padding counts against the budget
            area = -(-area // cfg.pair_quantum) * cfg.pair_quantum
        need = jnp.sum(jnp.where(ok, area.astype(jnp.float32), 0.0))
        return carry, need

    cams_nomask = _dc.replace(cameras, mask=None)
    _, needs = jax.lax.scan(one, 0, cams_nomask)
    return jnp.max(needs)


# Hard ceiling for the auto-sized pair budget: bounds the sort operands,
# the aligned Pallas table (64 B/pair) and the per-pair value cells to a
# few GB of HBM.  Scenes needing more degrade via the reported waterfill.
PAIR_BUDGET_CEIL = 1 << 25


def auto_pair_budget(
    scene_arrays, cameras, cfg: TileConfig,
    calc_surface_distance: bool = True,
) -> int:
    """Probe coverage and pick a quarter-octave pair budget covering it.

    Buckets are multiples of 2^(log2(need)-2) — i.e. {4,5,6,7,8}/4 x a
    power of two — so dead-pair padding stays under 25% (a pure pow-2
    bucket wasted up to ~50% of the sort/expand/reduce work on dead
    sentinels) while distinct budgets per octave stay at ~4, keeping
    recompiles rare across runs.  The +2% margin absorbs the probe's f32
    rounding.  Needs beyond the HBM ceiling clamp (and the sweep's
    truncation counters report the loss)."""
    need = float(
        jax.jit(
            lambda a, c: coverage_need(
                a, c, cfg, calc_surface_distance=calc_surface_distance
            )
        )(scene_arrays, cameras)
    )
    want = max(int(need * 1.02) + 4096, 1 << 14)
    step = 1 << max(12, int(math.floor(math.log2(want))) - 2)
    budget = -(-want // step) * step
    return min(budget, PAIR_BUDGET_CEIL)


def _build_pairs(
    prep, cfg: TileConfig, sort: bool = True, circle_cull: bool = True
):
    """Expand Gaussians into tile-sorted (key, gid) pair lists — the exact
    prefix-sum expansion of duplicateWithKeys (rasterizer_impl.cu:69-110)
    on a static pair budget.

    Per-Gaussian tile counts are waterfilled to fit the budget
    (see _waterfill_cap); offsets are an exclusive cumsum; pair j recovers
    its Gaussian via a scatter-one-at-offset + cumsum (the static-shape
    inverse of the prefix sum) and its tile via k = j - offset decoded
    over a centre-clamped window of the Gaussian's rect.  All per-pair
    Gaussian attributes ride ONE packed row gather.

    The sort key is (tile, depth-bits, gid) — positive-f32 depth bits are
    order-isomorphic to depth, the CUDA [tileID|depth] 64-bit key split
    across operands; gid breaks exact-depth ties deterministically.

    Returns (sorted_keys (L,), sorted_gid (L,) int32 with P as the
    sentinel for dead pairs, win_dropped () int32 — quality-relevant
    candidate tiles truncated by the waterfill this camera).
    """
    P = prep.valid.shape[0]
    L = cfg.pair_budget_for(P)
    if L >= 2**31:
        raise ValueError("pair budget must fit in int32")
    grid_area = max(cfg.grid_w * cfg.grid_h, 1)
    tile = cfg.tile

    # Window quantum: at production budgets, pad every window to a
    # Q-pair multiple so the pair -> Gaussian decode runs at group
    # (1/Q) granularity — the expansion's scatter/cummax/row-gather were
    # the sweep's dominant cost at 33.5M pairs (DESIGN.md §7a).  Small
    # budgets (tests / tiny scenes) keep Q=1: padding there could eat a
    # material fraction of the budget, and the decode is already cheap.
    Q = max(cfg.pair_quantum, 1) if L >= (1 << 20) else 1
    L = -(-L // Q) * Q
    G = L // Q

    rmin, rmax, xy = prep.rect_min, prep.rect_max, prep.xy
    rw = rmax[:, 0] - rmin[:, 0]
    rh = rmax[:, 1] - rmin[:, 1]
    ok_g = prep.valid & (rw > 0) & (rh > 0)

    s_cap = _waterfill_cap(rw, rh, ok_g, L, grid_area, quantum=Q)
    # The packed expansion table stores (s_w, cnt) in one exact-f32 lane
    # (9 + 15 bits), so a single window is capped at 2^15 - 1 tiles — far
    # beyond any sane per-Gaussian budget share; the clamp is counted as
    # window truncation below when it ever fires.
    s_cap = jnp.minimum(s_cap, (1 << 15) - 1)
    s_w, s_h = _win_dims(rw, rh, s_cap)
    cnt = jnp.where(ok_g, s_w * s_h, 0)  # live window length
    cnt_q = -(-cnt // Q) * Q if Q > 1 else cnt  # padded (dead tail) length
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt_q)[:-1].astype(jnp.int32)]
    )

    # Window origin: centred on the Gaussian's own tile, clamped into rect.
    ctx = jnp.clip(
        jnp.floor(xy[:, 0] / tile).astype(jnp.int32), rmin[:, 0], rmax[:, 0] - 1
    )
    cty = jnp.clip(
        jnp.floor(xy[:, 1] / tile).astype(jnp.int32), rmin[:, 1], rmax[:, 1] - 1
    )
    ox = jnp.clip(
        ctx - s_w // 2, rmin[:, 0], jnp.maximum(rmax[:, 0] - s_w, rmin[:, 0])
    )
    oy = jnp.clip(
        cty - s_h // 2, rmin[:, 1], jnp.maximum(rmax[:, 1] - s_h, rmin[:, 1])
    )

    # Quality-relevant truncation diagnostic: candidate tiles within the
    # alpha-cutoff radius radius_q that the emitted window does not cover.
    # Pairs beyond radius_q carry alpha < 1/255, which the blend skips —
    # the reference iterates them but they change nothing, so counting
    # them would flag clean renders as truncated.
    qminx = jnp.maximum(
        rmin[:, 0],
        jnp.floor((xy[:, 0] - prep.radius_q) / tile).astype(jnp.int32),
    )
    qmaxx = jnp.minimum(
        rmax[:, 0],
        jnp.floor((xy[:, 0] + prep.radius_q + tile - 1) / tile).astype(jnp.int32),
    )
    qminy = jnp.maximum(
        rmin[:, 1],
        jnp.floor((xy[:, 1] - prep.radius_q) / tile).astype(jnp.int32),
    )
    qmaxy = jnp.minimum(
        rmax[:, 1],
        jnp.floor((xy[:, 1] + prep.radius_q + tile - 1) / tile).astype(jnp.int32),
    )
    qw = jnp.maximum(qmaxx - qminx, 0)
    qh = jnp.maximum(qmaxy - qminy, 0)
    q_area = qw * qh
    kept_q = jnp.minimum(s_w, qw) * jnp.minimum(s_h, qh)
    # Budget-clamp tail (f32 slack shortfall / user-set tiny budgets):
    # windows starting at or past L lose their remainder.
    tail_lost = jnp.where(
        ok_g, jnp.clip(off + cnt - L, 0, cnt), 0
    )
    win_dropped = jnp.sum(
        jnp.where(ok_g, jnp.maximum(q_area - kept_q, 0), 0)
    ) + jnp.sum(tail_lost)

    # Packed per-Gaussian expansion table: ONE row gather serves every
    # per-pair quantity.  All lanes are exact f32 values (< 2^24); the
    # pair offset splits into hi/lo 12-bit limbs, and the small integer
    # fields pack two-per-lane so the row is 8 lanes wide — 8-lane row
    # gathers hit the cheap one-sublane-tile gather path (~2.8x faster
    # than 16 lanes on hardware).  Bit budgets: off <= 2^25 (13+12 limbs),
    # ox/oy < 2^9 (grid edges <= 511 tiles — an 8K image), s_w < 2^9,
    # cnt < 2^15 (the s_cap clamp above).  Row P is the sentinel.
    lane0 = (off >> 12) + ((oy.astype(jnp.int32)) << 13)  # 13 + 9 bits
    lane1 = (off & 0xFFF) + ((ox.astype(jnp.int32)) << 12)  # 12 + 9 bits
    lane2 = s_w.astype(jnp.int32) + (cnt.astype(jnp.int32) << 9)  # 9 + 15
    gtab = jnp.zeros((P + 1, 8), jnp.float32)
    gtab = gtab.at[:P, 0].set(lane0.astype(jnp.float32))
    gtab = gtab.at[:P, 1].set(lane1.astype(jnp.float32))
    gtab = gtab.at[:P, 2].set(lane2.astype(jnp.float32))
    gtab = gtab.at[:P, 3].set(xy[:, 0])
    gtab = gtab.at[:P, 4].set(xy[:, 1])
    gtab = gtab.at[:P, 5].set(prep.r_alpha_sq)
    gtab = gtab.at[:P, 6].set(prep.depth)

    # Pair group -> Gaussian: windows are Q-aligned, so every Q-pair
    # group belongs to exactly ONE window.  Scatter each non-empty
    # window's ORIGINAL Gaussian index at its start group, then a running
    # max — group g' belongs to the last window started at or before it.
    # Starts of non-empty windows are strictly increasing, so the scatter
    # is conflict-free.  Everything below runs at group (1/Q) granularity
    # with groups on the LANE axis of (Q, G) arrays — full-lane vectors.
    start_ok = (cnt > 0) & (off < L)
    gidx = jnp.arange(P, dtype=jnp.int32)
    seg = jnp.full(G, -1, jnp.int32).at[jnp.minimum(off // Q, G - 1)].max(
        jnp.where(start_ok, gidx, -1)
    )
    gid_g = jax.lax.cummax(seg)  # (G,) -1 before the first window start

    rows_g = gtab[jnp.where(gid_g < 0, P, gid_g)]  # (G, 8) row gather
    rt = rows_g.T  # (8, G)
    jg = jnp.arange(G, dtype=jnp.int32) * Q  # base pair id per group
    qrow = jnp.arange(Q, dtype=jnp.int32)[:, None]  # (Q, 1)

    h0 = rt[0].astype(jnp.int32)
    h1 = rt[1].astype(jnp.int32)
    h2 = rt[2].astype(jnp.int32)
    off_p = ((h0 & 0x1FFF) << 12) + (h1 & 0xFFF)  # (G,)
    s_w_p = jnp.maximum(h2 & 0x1FF, 1)[None, :]
    cnt_p = (h2 >> 9)[None, :]
    k = (jg - off_p)[None, :] + qrow  # (Q, G) rank within window
    pair_ok = (gid_g >= 0)[None, :] & (k < cnt_p)

    dx = k % s_w_p
    dy = k // s_w_p
    tile_x = (h1 >> 12)[None, :] + dx  # ox
    tile_y = (h0 >> 13)[None, :] + dy  # oy

    # Circle-vs-tile cull (AdR-Gaussian-style): drop pairs whose tile rect
    # lies entirely beyond the (adaptive) radius — their best-case alpha
    # is below the blend's 1/255 cutoff, so this culls exactly.  In
    # full-rect mode (surface distances: adaptive_radius off, r_alpha_sq
    # is the 3.4e38 sentinel) the test is statically a no-op — callers
    # pass circle_cull=False and the (Q, G) clip/FMA ops are skipped.
    if circle_cull:
        px = rt[3][None, :]
        py = rt[4][None, :]
        fx = tile_x.astype(jnp.float32) * tile
        fy = tile_y.astype(jnp.float32) * tile
        ddx = jnp.clip(px, fx, fx + (tile - 1)) - px
        ddy = jnp.clip(py, fy, fy + (tile - 1)) - py
        pair_ok = pair_ok & (ddx * ddx + ddy * ddy <= rt[5][None, :])

    gid_t = jnp.where(pair_ok, jnp.broadcast_to(gid_g[None, :], (Q, G)), P)
    dbits = jax.lax.bitcast_convert_type(rt[6], jnp.int32)  # (G,) depth bits

    # Sort key, two regimes (gated on L like the quantum):
    #  * packed: primary uint32 key (tile | top depth bits) + ONE
    #    auxiliary uint32 operand packing (next depth bits | gid).  The
    #    packed primary resolves almost every comparison in one u32
    #    compare; the aux operand extends the depth order by dlow_bits
    #    more bits of the positive-f32 pattern and breaks the rest by
    #    gid — depth order is exact to (depth_bits + dlow_bits) of 32
    #    bits (FULLY exact whenever that reaches 32; at worst, e.g. an
    #    8M-Gaussian scene, the last ~3 bits are gid-ordered: swaps only
    #    between splats whose depths agree to <8 ulps, invisible vs the
    #    reference's race-ordered atomics and pinned by the at-scale
    #    PSNR gate).  Truncating to the packed top bits ALONE reordered
    #    near-equal-depth splats vs the reference's 64-bit [tileID|depth]
    #    key (rasterizer_impl.cu:311-316) and cost ~20 dB at production
    #    pair densities — hence the aux depth extension.  TWO sort
    #    operands move ~2/3 the bytes of the previous
    #    (packed, dfull, gid) form through every merge pass, and unique
    #    keys admit an UNSTABLE sort (stability machinery costs ~an
    #    extra operand).  gid comes back as the aux low bits.
    #  * exact: (tile, depth bits, gid) 3-operand.
    gid_bits = max(int(math.ceil(math.log2(P + 2))), 1)
    dlow_bits = 32 - gid_bits
    if L >= (1 << 20) and dlow_bits >= 6:
        tile_bits = max(int(math.ceil(math.log2(cfg.num_tiles_pad + 2))), 1)
        depth_bits = 32 - tile_bits
        tile_key = (tile_y * cfg.grid_w + tile_x).astype(jnp.uint32)
        dbits_t = jnp.broadcast_to(dbits[None, :], (Q, G)).astype(jnp.uint32)
        dq = dbits_t >> (32 - depth_bits)
        packed_t = jnp.where(
            pair_ok,
            (tile_key << depth_bits) | dq,
            jnp.uint32(0xFFFFFFFF),
        )
        if not sort:  # diagnostics only (tools/bench_breakdown.py)
            packed = packed_t.T.reshape(L)
            gid_out = gid_t.T.reshape(L)
            keys = jnp.where(
                packed == jnp.uint32(0xFFFFFFFF),
                jnp.int32(_KEY_SENTINEL),
                (packed >> depth_bits).astype(jnp.int32),
            )
            return keys, gid_out, win_dropped.astype(jnp.int32)
        # Aux = (next dlow_bits of the depth pattern below the packed
        # prefix) << gid_bits | gid.  Dead pairs carry gid = P (the
        # sentinel row) with all-ones depth bits, keeping them ordered
        # after every live pair of the (nonexistent) sentinel tile.
        gid_mask = jnp.uint32((1 << gid_bits) - 1)
        dlow_shift = max(32 - depth_bits - dlow_bits, 0)
        dlow_mask = jnp.uint32((1 << dlow_bits) - 1)
        dlow_t = (dbits_t >> dlow_shift) & dlow_mask
        aux_t = jnp.where(
            pair_ok,
            (dlow_t << gid_bits) | gid_t.astype(jnp.uint32),
            (dlow_mask << gid_bits) | jnp.uint32(P),
        )
        # NO group-major transpose before the sort: (packed, aux) keys
        # are unique (one pair per (tile, gaussian)), so the unstable
        # sort's output is the one sorted sequence REGARDLESS of input
        # permutation — the (Q, G) arrays flatten as-is, skipping two
        # full-array minor-dim-4 relayouts that cost real HBM passes.
        packed = packed_t.reshape(L)
        aux = aux_t.reshape(L)
        sp, sa = jax.lax.sort((packed, aux), num_keys=2, is_stable=False)
        sorted_keys = jnp.where(
            sp == jnp.uint32(0xFFFFFFFF),
            jnp.int32(_KEY_SENTINEL),
            (sp >> depth_bits).astype(jnp.int32),
        )
        sorted_gid = (sa & gid_mask).astype(jnp.int32)
        return sorted_keys, sorted_gid, win_dropped.astype(jnp.int32)

    keys_t = jnp.where(pair_ok, tile_y * cfg.grid_w + tile_x, _KEY_SENTINEL)
    ranks_t = jnp.broadcast_to(dbits[None, :], (Q, G))

    # (Q, G) -> pair order: group-major flatten (pair j = G-group j//Q,
    # in-window rank j%Q).
    keys = keys_t.T.reshape(L)
    ranks = ranks_t.T.reshape(L)
    gid_out = gid_t.T.reshape(L)

    if not sort:  # diagnostics only (tools/bench_breakdown.py)
        return keys, gid_out, win_dropped.astype(jnp.int32)

    sorted_keys, sorted_gid = sort_pairs(keys, ranks, gid_out)
    return sorted_keys, sorted_gid, win_dropped.astype(jnp.int32)


def sort_pairs(keys, ranks, gid):
    """Sort the expanded pair list by (tile, depth-bits, gid).

    One 3-operand non-stable lax.sort: positive-f32 depth bits are
    order-isomorphic to depth (the CUDA 64-bit [tileID|depth] radix key,
    rasterizer_impl.cu:311-316, split across operands); gid breaks exact
    ties so the output is a pure function of the key multiset."""
    sorted_keys, _, sorted_gid = jax.lax.sort(
        (keys, ranks, gid), num_keys=3
    )
    return sorted_keys, sorted_gid


def pack_blend_table(prep, colours, compact: bool = False):
    """Per-Gaussian blend table in ORIGINAL order (no depth-reorder
    gathers — the concat fuses straight into the preprocess), PACKED one
    row per Gaussian.

    Full (16-lane) layout groups the geometry half separately from the
    colour half — [xy0 xy1 conic0..2 opacity depth pad | r g b pad..] —
    because per-pair ROW GATHERS on TPU are ~2.8x cheaper at 8 f32 lanes
    than 16 (one sublane tile per row), so consumers fetch the two (P, 8)
    halves with two cheap gathers instead of one expensive (P, 16)
    gather.

    Compact (8-lane) layout packs rgb into ONE exact-f32 24-bit integer
    lane — [xy0 xy1 conic0..2 opacity depth rgb24] — so consumers need a
    SINGLE 8-lane row gather per pair and the aligned Pallas table
    shrinks to 32 B/pair (see TileConfig.compact)."""
    P = prep.xy.shape[0]
    if compact:
        q = jnp.round(jnp.clip(colours, 0.0, 1.0) * 255.0).astype(jnp.int32)
        rgb24 = (q[:, 0] << 16) | (q[:, 1] << 8) | q[:, 2]
        return jnp.concatenate(
            [
                prep.xy,  # 0, 1
                prep.conic,  # 2, 3, 4
                prep.opacity[:, None],  # 5
                prep.depth[:, None],  # 6
                rgb24.astype(jnp.float32)[:, None],  # 7 (exact int < 2^24)
            ],
            axis=1,
        )
    return jnp.concatenate(
        [
            prep.xy,  # 0, 1
            prep.conic,  # 2, 3, 4
            prep.opacity[:, None],  # 5
            prep.depth[:, None],  # 6
            jnp.zeros((P, 1), jnp.float32),  # 7
            colours,  # 8, 9, 10
            jnp.zeros((P, 5), jnp.float32),  # 11-15
        ],
        axis=1,
    )


def _unpack_rgb24(lane):
    """Inverse of the compact rgb24 lane: (..., 1) f32 -> (..., 3) in [0,1]."""
    v = lane.astype(jnp.int32)
    return jnp.stack(
        [
            ((v >> 16) & 255).astype(jnp.float32),
            ((v >> 8) & 255).astype(jnp.float32),
            (v & 255).astype(jnp.float32),
        ],
        axis=-1,
    ) * jnp.float32(1.0 / 255.0)


# A dropped pair can still matter where some pixel's remaining
# transmittance exceeds the blend's own contribution floor (alpha cutoff
# 1/255): below it, any dropped pair's contribution would have been
# invisible.
_LIVE_T_FLOOR = 1.0 / 255.0


def _append_live_capdrop(diag3, cap_drop_tiles, live_tile, num_tiles: int):
    """Append counter 4: run-cap drops on tiles with live pixels."""
    live = live_tile[:num_tiles] > _LIVE_T_FLOOR
    runcap_live = jnp.sum(jnp.where(live, cap_drop_tiles, 0.0))
    return jnp.concatenate([diag3, runcap_live[None]])


def render_tile_camera(
    means: jnp.ndarray,
    cov_factors: jnp.ndarray,
    opacities: jnp.ndarray,
    colours: jnp.ndarray,
    alive: jnp.ndarray,
    camera,  # CameraBatch.at(i)
    cfg: TileConfig,
    mask: Optional[jnp.ndarray] = None,  # (Hp*Wp,) uint8; None = all visible
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    init_trans: Optional[jnp.ndarray] = None,  # (Hp*Wp,) f32 initial T per px
    early_stop: bool = True,
    want_trans: bool = False,  # populate RenderOutput.trans
    want_best_pix: bool = False,  # populate RenderOutput.best_pix
    surface_ed_override: Optional[jnp.ndarray] = None,  # (Hp*Wp,) f32
) -> RenderOutput:
    """Render one camera; returns image + per-Gaussian accumulator inputs.

    The ``init_trans`` / ``early_stop`` / ``want_trans`` / ``best_pix`` /
    ``surface_ed_override`` extensions serve the Gaussian-axis (depth-slab)
    sharded renderer (gs2pc.parallel.gauss_shard); both the XLA and the
    Pallas blend implement them (the reference likewise has one kernel for
    all call sites, forward.cu:303-497).
    """
    P = means.shape[0]
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
        tile=cfg.tile,
        antialiasing=antialiasing,
        # The AdR radius shrink is exact for blending but would shrink the
        # pixel set the surface pass measures over (reference semantics:
        # full 3-sigma rect, forward.cu:460-477).
        adaptive_radius=not calc_surface_distance,
    )

    table = pack_blend_table(prep, colours, compact=cfg.compact)

    if cfg.width_pad * cfg.height_pad >= 2**24:
        # Best-pixel ids ride per-pair buffers as exact f32 values.
        raise ValueError("padded image must stay below 2^24 pixels")
    if cfg.grid_w > 511 or cfg.grid_h > 511:
        # Window origins pack into 9-bit fields of the expansion table.
        raise ValueError("image edges must stay below 8192 pixels")

    # Full-rect mode (surface distances) sets r_alpha_sq to the never-
    # culls sentinel — skip the circle test's per-pair ops statically.
    keys, pair_gid, win_dropped = _build_pairs(
        prep, cfg, circle_cull=not calc_surface_distance
    )
    L = keys.shape[0]

    # Fully-masked tiles produce nothing (invalid pixels blend nothing and
    # are excluded from the surface min): their runs are zeroed once here
    # and the same liveness predicate feeds the diagnostics, the XLA blend
    # batches and the Pallas aligned-pair build.  `!= 0` matches the
    # per-pixel validity predicate exactly (a signed mask with negative
    # truthy values must not skip its tile).
    tile_live_mask = None
    if mask is not None:
        tile_live_mask = jnp.max(
            _to_tiles(mask, cfg, 0, mask.dtype) != 0, axis=1
        )  # (NTP,) bool

    # Truncation diagnostics (float32 counters: psum-able, overflow-safe):
    # [pairs blended, window-truncated candidates, run-cap-dropped pairs,
    # run-cap drops on LIVE tiles].  The 4th entry is appended after the
    # blend: a dropped pair can only matter where some pixel's final
    # transmittance is still above the visibility floor — run-cap drops
    # are the front-to-back TAIL of a tile, exactly the pairs the
    # reference's early exit skips, so counting all of them flags fully
    # occluded (harmless) truncation as quality loss.
    diag_tids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    d_starts = jnp.searchsorted(keys, diag_tids, side="left")
    d_ends = jnp.searchsorted(keys, diag_tids, side="right")
    d_runs = (d_ends - d_starts).astype(jnp.float32)
    if tile_live_mask is not None:
        # Masked-out tiles stream no pairs: keep the counters honest.
        d_runs = jnp.where(tile_live_mask[: cfg.num_tiles], d_runs, 0.0)
    cap_drop_tiles = jnp.maximum(d_runs - cfg.run_cap, 0.0)  # (num_tiles,)
    runcap_dropped = jnp.sum(cap_drop_tiles)
    pairs_blended = jnp.sum(jnp.minimum(d_runs, cfg.run_cap))
    diag = jnp.stack(
        [pairs_blended, win_dropped.astype(jnp.float32), runcap_dropped]
    )

    if use_pallas:
        # Mosaic only exists on TPU; anywhere else the kernel runs in
        # interpret mode (slow, for tests / debugging).  The probe must
        # recognise every TPU plugin name ('tpu', 'axon', ...): a false
        # negative here would run interpret mode on real hardware — a
        # ~1000x silent slowdown.
        from gs2pc.utils.platform import is_tpu_backend

        pallas_interpret = pallas_interpret or not is_tpu_backend()
        return _finish_pallas(
            prep, table, keys, pair_gid, camera, cfg, mask,
            white_bkgd, calc_surface_distance, pallas_interpret, P, diag,
            cap_drop_tiles=cap_drop_tiles,
            tile_live_mask=tile_live_mask,
            init_trans=init_trans,
            early_stop=early_stop,
            want_trans=want_trans,
            want_best_pix=want_best_pix,
            surface_ed_override=surface_ed_override,
        )

    TB = cfg.tile_batch_eff
    NTP = cfg.num_tiles_pad
    NB = NTP // TB
    Rs = cfg.run_chunk
    max_steps = max(-(-cfg.run_cap // Rs), 1)
    tpx = cfg.tile * cfg.tile  # pixels per tile

    all_tids = jnp.arange(NTP, dtype=jnp.int32)
    starts_all = jnp.searchsorted(keys, all_tids, side="left").astype(jnp.int32)
    ends_all = jnp.searchsorted(keys, all_tids, side="right").astype(jnp.int32)
    counts_all = jnp.minimum(ends_all - starts_all, cfg.run_cap)
    if tile_live_mask is not None:
        # Zero fully-masked tiles' runs so the load-ordered batches skip
        # them outright (liveness predicate computed once above).
        counts_all = jnp.where(tile_live_mask, counts_all, 0)

    # Process tiles in descending-run-length order: each batch's inner loop
    # runs only ceil(batch_max/Rs) dynamic steps, so sparse tiles don't pay
    # for dense ones (the CUDA analogue is per-block early exit).
    tid_by_load = all_tids[jnp.argsort(-counts_all)]

    ly, lx = jnp.divmod(jnp.arange(tpx, dtype=jnp.int32), cfg.tile)

    mask_flat = mask

    def tile_geometry(tids):
        ty, tx = jnp.divmod(tids, cfg.grid_w)
        gx = tx[:, None] * cfg.tile + lx[None, :]  # (TB, tpx)
        gy = ty[:, None] * cfg.tile + ly[None, :]
        px = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)
        pixid = gy * cfg.width_pad + gx  # padded row-major pixel id
        valid_px = (gx < camera.width) & (gy < camera.height) & (
            tids[:, None] < cfg.num_tiles
        )
        if mask_flat is not None:
            valid_px = valid_px & (mask_flat[pixid] != 0)
        return px, pixid, valid_px

    def gather_run(start, count, r):
        offs = r * Rs + jnp.arange(Rs, dtype=jnp.int32)  # (Rs,)
        idx = start[:, None] + offs[None, :]  # (TB, Rs)
        in_run = offs[None, :] < count[:, None]
        safe = jnp.clip(idx, 0, L - 1)
        gid = pair_gid[safe]
        return gid, safe, in_run

    if cfg.compact:
        # ONE 8-lane row gather per pair; rgb unpacks from lane 7.
        def chunk_tables(gid):
            tg = table[gid]  # (TB, Rs, 8)
            return (
                tg[..., 0:2],  # xy
                tg[..., 2:5],  # conic
                tg[..., 5],  # opacity
                _unpack_rgb24(tg[..., 7]),  # colour
                tg[..., 6],  # depth
            )
    else:
        # Two (P, 8) halves: 8-lane row gathers hit the cheap
        # one-sublane-tile path (~2.8x faster than a 16-lane gather).
        table_geo = table[:, :8]
        table_col = table[:, 8:]

        def chunk_tables(gid):
            tg = table_geo[gid]  # (TB, Rs, 8)
            tc = table_col[gid]
            return (
                tg[..., 0:2],  # xy
                tg[..., 2:5],  # conic
                tg[..., 5],  # opacity
                tc[..., 0:3],  # colour
                tg[..., 6],  # depth
            )

    # Per-PAIR value cells, indexed by position in the sorted pair list
    # (cell L is the dump slot for masked lanes).  Every blended pair owns
    # a unique cell, so the in-loop scatters are plain conflict-free sets;
    # the per-Gaussian reductions happen once at the end via windowed
    # scatter-max/min over the occupied prefix (_pair_reduce).  (m, apix)
    # pack into ONE row per pair — scatter cost is per-transaction, so one
    # 2-lane row scatter beats two element scatters; apix rides as an
    # exact f32 VALUE (< 2^24).
    matab0 = jnp.zeros((L + 1, 2), jnp.float32)

    def batch_step(matab, b):
        tids = jax.lax.dynamic_slice_in_dim(tid_by_load, b * TB, TB)
        start = starts_all[tids]
        count = counts_all[tids]
        n_steps = jnp.minimum(
            -(-jnp.max(count) // Rs), max_steps
        ).astype(jnp.int32)
        px, pixid, valid_px = tile_geometry(tids)
        t0 = None if init_trans is None else init_trans[pixid]
        carry0 = init_carry((TB, tpx), done0=~valid_px, t0=t0)

        def cond(state):
            r, carry, _, _ = state
            return (r < n_steps) & jnp.logical_not(jnp.all(carry.done))

        def body(state):
            r, carry, matab, n_stream = state
            # Chunks streamed per TILE: chunk r streams iff the tile still
            # has a not-done pixel at its start and the run reaches it —
            # the reference's block-level break test (forward.cu:369-371)
            # at run_chunk granularity.  Feeds the surface_compact cap.
            n_stream = n_stream + (
                ~jnp.all(carry.done, axis=1) & (r * Rs < count)
            ).astype(jnp.int32)
            gid, idx, in_run = gather_run(start, count, r)
            xy, conic, op, col, dep = chunk_tables(gid)
            new_carry, w = blend_chunk(
                carry, px, xy, conic, op, col, dep, in_run,
                early_stop=early_stop,
            )
            m = jnp.max(w, axis=1)  # (TB, Rs)
            arg = jnp.argmax(w, axis=1).astype(jnp.int32)
            apix = jnp.take_along_axis(pixid, arg, axis=1)
            slot = jnp.where(in_run, idx, L).reshape(-1)
            vals = jnp.stack(
                [m.reshape(-1), apix.reshape(-1).astype(jnp.float32)],
                axis=1,
            )
            matab = matab.at[slot].set(vals)
            return r + 1, new_carry, matab, n_stream

        _, carry, matab, n_stream = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), carry0, matab, jnp.zeros(TB, jnp.int32)),
        )

        bg = jnp.float32(1.0 if white_bkgd else 0.0)
        tile_col = jnp.where(
            valid_px[..., None],
            carry.colour + carry.transmittance[..., None] * bg,
            0.0,
        )
        tile_ed = jnp.where(valid_px, carry.exp_depth, 0.0)
        tile_einv = jnp.where(valid_px, carry.exp_invdepth, 0.0)
        # Neutral (T=1) on invalid pixels so cross-device prefix products
        # stay well-defined.
        tile_T = jnp.where(valid_px, carry.transmittance, 1.0)
        # Max live transmittance over valid AND not-early-stopped pixels
        # (the 4th truncation counter's visibility test: a done pixel
        # never blends again, so drops there cannot matter).
        tile_live = jnp.max(
            jnp.where(
                valid_px & ~carry.done, carry.transmittance, 0.0
            ),
            axis=1,
        )
        return matab, (
            tile_col, tile_ed, tile_einv, tile_T, tile_live, n_stream
        )

    matab, (
        tiles_col, tiles_ed, tiles_einv, tiles_T, tiles_live, n_stream_b
    ) = (
        jax.lax.scan(batch_step, matab0, jnp.arange(NB, dtype=jnp.int32))
    )
    # Occupied prefix: real-tile pairs sort before the sentinels.
    n_real = jnp.searchsorted(keys, jnp.int32(cfg.num_tiles)).astype(jnp.int32)

    # Tiles were visited in load order; scatter back to tile-id order.
    def unshuffle(t):  # (NB, TB, ...) -> (NTP, ...) in tile-id order
        flat = t.reshape((NTP,) + t.shape[2:])
        out = jnp.zeros_like(flat)
        return out.at[tid_by_load].set(flat)

    tiles_col = unshuffle(tiles_col)
    tiles_ed = unshuffle(tiles_ed)
    tiles_einv = unshuffle(tiles_einv)
    n_stream_all = unshuffle(n_stream_b)  # (NTP,) streamed chunks per tile
    live_tile = unshuffle(tiles_live)  # (NTP,)
    diag = _append_live_capdrop(diag, cap_drop_tiles, live_tile, cfg.num_tiles)
    tiles_T = unshuffle(tiles_T) if want_trans else None

    # Tile-major -> row-major image assembly.
    def untile(t):  # t: (NTP, tpx[, 3])
        extra = t.shape[2:]
        t = t[: cfg.num_tiles]
        t = t.reshape((cfg.grid_h, cfg.grid_w, cfg.tile, cfg.tile) + extra)
        t = jnp.swapaxes(t, 1, 2)
        return t.reshape((cfg.height_pad, cfg.width_pad) + extra)

    image = untile(tiles_col)
    ed = untile(tiles_ed)
    einv = untile(tiles_einv)
    trans_map = untile(tiles_T) if want_trans else None

    # Per-Gaussian reductions (deterministic replacements for CUDA atomics):
    # windowed scatter-max/min over the occupied pair prefix — max and min
    # are exactly associative, so collision order cannot change results.
    contrib, best_colour, best_pix = _pair_reduce(
        pair_gid, matab[:, 0], matab[:, 1], image, P, n_real,
        allow_packed=cfg.width_pad * cfg.height_pad < (1 << 20),
    )

    if calc_surface_distance:
        if surface_ed_override is not None:
            # Global expected-depth map (row-major (Hp*Wp,)) -> tile-major.
            ov = surface_ed_override.reshape(cfg.height_pad, cfg.width_pad)
            ov = ov.reshape(cfg.grid_h, cfg.tile, cfg.grid_w, cfg.tile)
            ov = jnp.swapaxes(ov, 1, 2).reshape(cfg.num_tiles, tpx)
            ed_tiles = jnp.zeros((NTP, tpx), jnp.float32).at[
                : cfg.num_tiles
            ].set(ov)
        else:
            ed_tiles = tiles_ed.reshape(NTP, tpx)
        # Direct per-Gaussian scatter-min (min is exactly associative, so
        # collisions are order-free and deterministic); row P is the dump.
        sdtab0 = jnp.full(P + 1, FLOAT_MAX, jnp.float32)
        depth_tbl = table[:, 6]  # 1-col gathers are far cheaper than rows

        def surf_batch(sdtab, b):
            tids = jax.lax.dynamic_slice_in_dim(tid_by_load, b * TB, TB)
            start = starts_all[tids]
            count = counts_all[tids]
            if cfg.surface_compact:
                # Reference break semantics (forward.cu:369-371): pairs in
                # chunks past the tile's blend early exit never enter the
                # surface min.
                count = jnp.minimum(count, n_stream_all[tids] * Rs)
            n_steps = jnp.minimum(
                -(-jnp.max(count) // Rs), max_steps
            ).astype(jnp.int32)
            _, pixid, valid_px = tile_geometry(tids)
            ed_b = ed_tiles[tids]  # (TB, tpx)

            def cond(state):
                r, _ = state
                return r < n_steps

            def body(state):
                r, sdtab = state
                gid, _, in_run = gather_run(start, count, r)
                dep = depth_tbl[gid]
                dist = jnp.abs(dep[:, None, :] - ed_b[:, :, None])
                ok = valid_px[:, :, None] & in_run[:, None, :]
                dist = jnp.where(ok, dist, FLOAT_MAX)
                sd = jnp.min(dist, axis=1)  # (TB, Rs)
                tgt = jnp.where(in_run, gid, P).reshape(-1)
                sdtab = sdtab.at[tgt].min(sd.reshape(-1))
                return r + 1, sdtab

            _, sdtab = jax.lax.while_loop(cond, body, (jnp.int32(0), sdtab))
            return sdtab, None

        sdtab, _ = jax.lax.scan(
            surf_batch, sdtab0, jnp.arange(NB, dtype=jnp.int32)
        )
        surf = sdtab[:P]
    else:
        surf = jnp.full(P, FLOAT_MAX, jnp.float32)

    return RenderOutput(
        image=image,
        depth=ed,
        invdepth=einv,
        radii=prep.radius,
        contrib=contrib,
        best_colour=best_colour,
        surf_dist=surf,
        trans=trans_map,
        best_pix=best_pix if want_best_pix else None,
        n_dropped=diag,
    )


def _sd_reduce(gid_pairs, sd_pairs, P: int, n_occupied):
    """Per-Gaussian min surface distance: windowed scatter-min over the
    occupied ALIGNED pair prefix (min is exactly associative, so scatter
    collisions are order-free — the deterministic replacement for the
    CUDA kernel's racy non-atomic update, forward.cu:463-471)."""
    Lp = gid_pairs.shape[0]
    W = min(1 << 20, Lp)
    n_win_cap = -(-Lp // W)

    def cond(state):
        w = state[0]
        return (w * W < n_occupied) & (w < n_win_cap)

    def body(state):
        w, sdtab = state
        off = w * W
        g = jax.lax.dynamic_slice_in_dim(gid_pairs, off, W)
        sd = jax.lax.dynamic_slice_in_dim(sd_pairs, off, W)
        return w + 1, sdtab.at[g].min(sd)

    sdtab0 = jnp.full(P + 1, FLOAT_MAX, jnp.float32)
    _, sdtab = jax.lax.while_loop(cond, body, (jnp.int32(0), sdtab0))
    return jnp.where(jnp.isinf(sdtab[:P]), FLOAT_MAX, sdtab[:P])


_APIX_NONE = jnp.float32(1 << 24)  # > any padded pixel id (asserted < 2^24)


def _pair_reduce(
    gid_pairs, m_pairs, apix_pairs, image, P: int, n_occupied,
    sd_pairs=None, allow_packed: bool = True,
):
    """Per-pair values -> per-Gaussian (max contribution, best colour
    [, min surface distance]) via windowed scatter reductions over the
    occupied pair prefix [0, n_occupied).

    max/min are exactly associative and commutative in f32, so scatter
    collisions are order-free — the deterministic replacement for the
    CUDA CAS-loop float atomics (forward.cu:463-471).  The best pixel is
    a second pass: among pairs matching the Gaussian's max contribution,
    the LOWEST pixel id wins (deterministic tie-break; the reference's
    atomics are race-ordered).  Windows are dynamic-sliced; the clamped
    final window re-reduces a few pairs, which idempotent max/min absorb.
    """
    Lp = gid_pairs.shape[0]
    W = min(1 << 20, Lp)
    n_win_cap = -(-Lp // W)
    with_sd = sd_pairs is not None
    m_pairs = m_pairs[:Lp]
    # Argmax-pixel policy, two regimes (gated on Lp like the expansion):
    #  * exact (small/test scales): second windowed pass — among pairs
    #    matching the Gaussian's exact max contribution, lowest pixel id.
    #  * packed (production scales): ONE extra scatter-max in pass 1 of
    #    (m linearly quantized to 12 bits | complemented pixel id) — the
    #    colour-source pixel is then the lowest pixel id among pairs
    #    whose contribution is within 2^-12 ABSOLUTE of the max.  The
    #    reported contributions stay exact (separate scatter); only the
    #    colour-sampling pixel can differ, and only between pairs whose
    #    contributions tie to 2.4e-4 — a band the reference resolves by
    #    atomic-race order anyway (forward.cu:428-456).  Saves the
    #    second windowed pass and its per-pair ctab gather.  Requires
    #    pixel ids to fit 20 bits (callers gate via ``allow_packed``).
    fast = allow_packed and Lp >= (1 << 20)

    def cond(state):
        w = state[0]
        return (w * W < n_occupied) & (w < n_win_cap)

    if fast:
        apix_u = apix_pairs[:Lp].astype(jnp.uint32)
        q_pairs = (
            jnp.minimum((m_pairs * 4096.0), 4095.0).astype(jnp.uint32)
            << 20
        ) | (jnp.uint32(0xFFFFF) - apix_u)
        # Zero-contribution rows are INERT: unset/removed slots (XLA matab
        # rows never written, Pallas early-exit zero fill, masked-tile
        # drops) must not steal the argmax pixel from a real pair whose
        # contribution quantizes below 2^-12.
        q_pairs = jnp.where(m_pairs > 0.0, q_pairs, jnp.uint32(0))
        # Three SEPARATE element scatters, deliberately: folding them
        # into one multi-lane uint32 row scatter-max (order-isomorphic
        # bit packing) measured ~1.8x SLOWER on hardware (372 vs 207 ms
        # at 8.4M pairs) — scatter-combiner ops pay per LANE here, not
        # per transaction like the blend loop's matab row-set scatters.

        def body1f(state):
            w, ctab, qtab, sdtab = state
            off = w * W
            g = jax.lax.dynamic_slice_in_dim(gid_pairs, off, W)
            m = jax.lax.dynamic_slice_in_dim(m_pairs, off, W)
            q = jax.lax.dynamic_slice_in_dim(q_pairs, off, W)
            ctab = ctab.at[g].max(m)
            qtab = qtab.at[g].max(q)
            if with_sd:
                sd = jax.lax.dynamic_slice_in_dim(sd_pairs, off, W)
                sdtab = sdtab.at[g].min(sd)
            return w + 1, ctab, qtab, sdtab

        ctab0 = jnp.zeros(P + 1, jnp.float32)
        qtab0 = jnp.zeros(P + 1, jnp.uint32)
        sdtab0 = jnp.full(P + 1 if with_sd else 1, FLOAT_MAX, jnp.float32)
        _, ctab, qtab, sdtab = jax.lax.while_loop(
            cond, body1f, (jnp.int32(0), ctab0, qtab0, sdtab0)
        )
        contrib = ctab[:P]
        apix = (
            jnp.uint32(0xFFFFF) - (qtab[:P] & jnp.uint32(0xFFFFF))
        ).astype(jnp.int32)
        apix = jnp.where(contrib > 0.0, apix, 0)
        best_colour = jnp.where(
            (contrib > 0.0)[:, None], image.reshape(-1, 3)[apix], 0.0
        )
        if with_sd:
            surf = jnp.where(jnp.isinf(sdtab[:P]), FLOAT_MAX, sdtab[:P])
            return contrib, best_colour, apix, surf
        return contrib, best_colour, apix

    apix_pairs = apix_pairs[:Lp].astype(jnp.float32)

    def body1(state):
        w, ctab, sdtab = state
        off = w * W
        g = jax.lax.dynamic_slice_in_dim(gid_pairs, off, W)
        m = jax.lax.dynamic_slice_in_dim(m_pairs, off, W)
        ctab = ctab.at[g].max(m)
        if with_sd:
            sd = jax.lax.dynamic_slice_in_dim(sd_pairs, off, W)
            sdtab = sdtab.at[g].min(sd)
        return w + 1, ctab, sdtab

    ctab0 = jnp.zeros(P + 1, jnp.float32)  # CUDA init: contributions >= 0
    sdtab0 = jnp.full(P + 1 if with_sd else 1, FLOAT_MAX, jnp.float32)
    _, ctab, sdtab = jax.lax.while_loop(
        cond, body1, (jnp.int32(0), ctab0, sdtab0)
    )

    def body2(state):
        w, atab = state
        off = w * W
        g = jax.lax.dynamic_slice_in_dim(gid_pairs, off, W)
        m = jax.lax.dynamic_slice_in_dim(m_pairs, off, W)
        a = jax.lax.dynamic_slice_in_dim(apix_pairs, off, W)
        win = (m > 0.0) & (m >= ctab[g])
        atab = atab.at[g].min(jnp.where(win, a, _APIX_NONE))
        return w + 1, atab

    atab0 = jnp.full(P + 1, _APIX_NONE, jnp.float32)
    _, atab = jax.lax.while_loop(cond, body2, (jnp.int32(0), atab0))

    contrib = ctab[:P]
    apix = jnp.where(atab[:P] < _APIX_NONE, atab[:P], 0.0).astype(jnp.int32)
    best_colour = jnp.where(
        (contrib > 0.0)[:, None], image.reshape(-1, 3)[apix], 0.0
    )
    if with_sd:
        surf = jnp.where(jnp.isinf(sdtab[:P]), FLOAT_MAX, sdtab[:P])
        return contrib, best_colour, apix, surf
    return contrib, best_colour, apix


def _untile(t, cfg: TileConfig):  # (NTP, tpx[, k]) -> (Hp, Wp[, k])
    extra = t.shape[2:]
    t = t[: cfg.num_tiles]
    t = t.reshape((cfg.grid_h, cfg.grid_w, cfg.tile, cfg.tile) + extra)
    t = jnp.swapaxes(t, 1, 2)
    return t.reshape((cfg.height_pad, cfg.width_pad) + extra)


def _to_tiles(flat, cfg: TileConfig, fill, dtype):
    """Row-major (Hp*Wp,) -> tile-major (NTP, tpx) with fill padding."""
    tpx = cfg.tile * cfg.tile
    t = jnp.asarray(flat, dtype).reshape(cfg.height_pad, cfg.width_pad)
    t = t.reshape(cfg.grid_h, cfg.tile, cfg.grid_w, cfg.tile)
    t = jnp.swapaxes(t, 1, 2).reshape(cfg.num_tiles, tpx)
    return jnp.full(
        (cfg.num_tiles_pad, tpx), fill, dtype
    ).at[: cfg.num_tiles].set(t)


def _finish_pallas(
    prep, table, keys, pair_gid, camera, cfg: TileConfig, mask,
    white_bkgd, calc_surface_distance, interpret, P, diag=None,
    cap_drop_tiles=None, tile_live_mask=None,
    init_trans=None, early_stop=True, want_trans=False,
    want_best_pix=False, surface_ed_override=None,
):
    """Pallas-kernel blend path (see gs2pc.ops.pallas_blend)."""
    from gs2pc.ops.pallas_blend import build_aligned_pairs, pallas_blend

    NTP = cfg.num_tiles_pad
    Rs = cfg.run_chunk
    tpx = cfg.tile * cfg.tile

    if mask is not None:
        # Normalised to 0/1: the kernel tests its float-cast mask block
        # against 0.5, which must match the `!= 0` pixel predicate even
        # for (out-of-contract) signed mask dtypes.
        mask_tiles = (
            _to_tiles(mask, cfg, 0, mask.dtype) != 0
        ).astype(jnp.uint8)
        tile_live = (
            tile_live_mask if tile_live_mask is not None
            else jnp.max(mask_tiles != 0, axis=1)
        )
    else:
        mask_tiles = jnp.ones((NTP, tpx), jnp.uint8)
        tile_live = None

    pairs = build_aligned_pairs(
        table, keys, pair_gid,
        num_tiles_pad=NTP, run_cap=cfg.run_cap, run_chunk=Rs,
        tile_live=tile_live,
    )

    t0_tiles = (
        None if init_trans is None
        else _to_tiles(init_trans, cfg, 1.0, jnp.float32)
    )
    edov_tiles = (
        None if surface_ed_override is None
        else _to_tiles(surface_ed_override, cfg, 0.0, jnp.float32)
    )

    (
        tiles_rgb, tiles_ed, tiles_einv, tiles_T,
        m_c, apix_c, gid_c, total_c, sd_al, tiles_live,
    ) = pallas_blend(
        pairs, mask_tiles, camera.width, camera.height,
        num_tiles=cfg.num_tiles, num_tiles_pad=NTP,
        grid_w=cfg.grid_w, width_pad=cfg.width_pad,
        run_chunk=Rs, white_bkgd=white_bkgd,
        run_cap_hint=cfg.run_cap, with_surface=calc_surface_distance,
        surface_compact=cfg.surface_compact,
        interpret=interpret,
        init_trans_tiles=t0_tiles,
        ed_override_tiles=edov_tiles,
        early_stop=early_stop,
    )

    image = _untile(tiles_rgb, cfg)  # (Hp, Wp, 3)
    ed = _untile(tiles_ed, cfg)
    einv = _untile(tiles_einv, cfg)
    trans_map = _untile(tiles_T, cfg) if want_trans else None

    if diag is not None and cap_drop_tiles is not None:
        # tiles_live is already 0 on invalid and early-stopped pixels.
        live_tile = jnp.max(tiles_live, axis=1)  # (NTP,)
        diag = _append_live_capdrop(
            diag, cap_drop_tiles, live_tile, cfg.num_tiles
        )

    # Per-Gaussian reductions: windowed scatter-max/min by Gaussian id.
    # (m, apix) come from the kernel's COMPACT stream — only chunks the
    # blend actually streamed occupy [0, total_c), so the scatters scan a
    # several-fold smaller domain on early-exit-heavy scenes.  Results
    # are identical to reducing the full aligned stream: skipped chunks'
    # rows are all-zero, and zero rows are inert in both scatter passes.
    # With surface_compact, sd rides the SAME compact stream (reference
    # break semantics, forward.cu:369-371), so its scatter-min fuses into
    # the one windowed pass; otherwise sd stays aligned-order and reduces
    # over the full occupied prefix.
    packed_ok = cfg.width_pad * cfg.height_pad < (1 << 20)
    if calc_surface_distance and cfg.surface_compact:
        contrib, best_colour, best_pix, surf = _pair_reduce(
            gid_c, m_c, apix_c, image, P, total_c,
            sd_pairs=sd_al, allow_packed=packed_ok,
        )
    else:
        contrib, best_colour, best_pix = _pair_reduce(
            gid_c, m_c, apix_c, image, P, total_c,
            allow_packed=packed_ok,
        )
        if calc_surface_distance:
            surf = _sd_reduce(pairs.gid, sd_al, P, pairs.total)
        else:
            surf = jnp.full(P, FLOAT_MAX, jnp.float32)

    return RenderOutput(
        image=image,
        depth=ed,
        invdepth=einv,
        radii=prep.radius,
        contrib=contrib,
        best_colour=best_colour,
        surf_dist=surf,
        trans=trans_map,
        best_pix=best_pix if want_best_pix else None,
        n_dropped=diag,
    )

"""Tile-binned splat rasterizer — the production TPU renderer.

This is the TPU-native redesign of the reference's CUDA rasterizer core
(cuda_rasterizer/rasterizer_impl.cu:197-352, forward.cu:153-497).  The CUDA
pipeline is: preprocess -> prefix-sum -> duplicateWithKeys -> radix sort on
[tileID|depth] 64-bit keys -> identifyTileRanges -> per-tile blend with
shared-memory batches and CAS-loop float atomics for per-Gaussian maxima.

TPU mapping (all fixed shapes, no atomics):

1.  preprocess: vectorised jnp over the Gaussian axis (ops/projection.py).
2.  ONE global depth argsort of Gaussians (replaces the per-key depth bits:
    a later *stable* sort by tile id alone preserves depth order per tile).
3.  pair expansion with a static per-Gaussian slot budget S: slot k of
    Gaussian g maps to the k-th cell of a window of its tile rect centred
    on its projected centre.  Gaussians covering more than S tiles are
    truncated to the S nearest tiles (the reference has no cap; S is a
    quality/perf knob — raise it for scenes with giant splats, or cull
    them as the reference recommends).
4.  stable lax.sort by int32 tile key -> per-tile contiguous runs;
    searchsorted yields (start, count) per tile — CUDA's identifyTileRanges.
5.  blend: scan over tile batches x run chunks; each step blends a
    (tile_batch, 256 px, run_chunk) block with exact CUDA alpha/early-stop
    semantics (ops/blend.py).  Colour accumulation is an MXU matmul.
6.  per-Gaussian (max contribution, argmax pixel) and min surface distance
    become segment_max/segment_min reductions over emitted per-pair values
    — deterministic where the CUDA kernel raced (forward.cu:463-471).

Per-tile runs are capped at R_cap *front-to-back*: beyond a few thousand
front Gaussians, transmittance is ~0 and the CUDA kernel would have
early-exited anyway, so the dropped tail is invisible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gs2pc.ops.blend import FLOAT_MAX, RenderOutput, blend_chunk, init_carry
from gs2pc.ops.projection import preprocess

_KEY_SENTINEL = jnp.int32(2**30)


class TileConfig(NamedTuple):
    """Static rasterizer geometry (all Python ints at trace time)."""

    width_pad: int
    height_pad: int
    tile: int = 16
    slots: int = 16  # S: max tiles per Gaussian
    run_cap: int = 4096  # R_cap: max pairs blended per tile
    run_chunk: int = 128  # Rs: pairs per inner step
    tile_batch: int = 256  # TB: tiles per outer step

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


def _build_pairs(prep, order, cfg: TileConfig):
    """Expand depth-ordered Gaussians into tile-sorted (key, pair) lists.

    Returns (sorted_keys (L,), sorted_pair_g (L,)) where pair_g indexes the
    depth-ordered Gaussian table; stable sort keeps front-to-back order
    within each tile.
    """
    S = cfg.slots
    rmin = prep.rect_min[order]  # (P, 2) int32
    rmax = prep.rect_max[order]
    valid = prep.valid[order]
    xy = prep.xy[order]

    rw = rmax[:, 0] - rmin[:, 0]
    rh = rmax[:, 1] - rmin[:, 1]
    s_w = jnp.clip(rw, 1, S)
    s_h = jnp.clip(jnp.minimum(rh, S // jnp.maximum(s_w, 1)), 1, S)

    # Window origin: centred on the Gaussian's own tile, clamped into rect.
    ctx = jnp.clip(
        jnp.floor(xy[:, 0] / cfg.tile).astype(jnp.int32), rmin[:, 0], rmax[:, 0] - 1
    )
    cty = jnp.clip(
        jnp.floor(xy[:, 1] / cfg.tile).astype(jnp.int32), rmin[:, 1], rmax[:, 1] - 1
    )
    ox = jnp.clip(ctx - s_w // 2, rmin[:, 0], jnp.maximum(rmax[:, 0] - s_w, rmin[:, 0]))
    oy = jnp.clip(cty - s_h // 2, rmin[:, 1], jnp.maximum(rmax[:, 1] - s_h, rmin[:, 1]))

    k = jnp.arange(S, dtype=jnp.int32)  # (S,)
    dx = k[None, :] % jnp.maximum(s_w, 1)[:, None]  # (P, S)
    dy = k[None, :] // jnp.maximum(s_w, 1)[:, None]
    slot_ok = valid[:, None] & (dy < s_h[:, None])

    tile_id = (oy[:, None] + dy) * cfg.grid_w + (ox[:, None] + dx)
    keys = jnp.where(slot_ok, tile_id, _KEY_SENTINEL).reshape(-1)
    pair_g = jnp.broadcast_to(
        jnp.arange(order.shape[0], dtype=jnp.int32)[:, None], (order.shape[0], S)
    ).reshape(-1)

    sorted_keys, sorted_pair_g = jax.lax.sort(
        (keys, pair_g), num_keys=1, is_stable=True
    )
    return sorted_keys, sorted_pair_g


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
) -> RenderOutput:
    """Render one camera; returns image + per-Gaussian accumulator inputs."""
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
    )

    sort_key = jnp.where(prep.valid, prep.depth, FLOAT_MAX)
    order = jnp.argsort(sort_key)

    # Depth-ordered per-Gaussian tables.
    t_xy = prep.xy[order]
    t_conic = prep.conic[order]
    t_op = prep.opacity[order]
    t_col = colours[order]
    t_depth = prep.depth[order]

    keys, pair_g = _build_pairs(prep, order, cfg)
    L = keys.shape[0]

    TB = cfg.tile_batch_eff
    NTP = cfg.num_tiles_pad
    NB = NTP // TB
    steps = max(cfg.run_cap // cfg.run_chunk, 1)
    Rs = cfg.run_chunk
    tpx = cfg.tile * cfg.tile  # pixels per tile

    all_tids = jnp.arange(NTP, dtype=jnp.int32)
    starts_all = jnp.searchsorted(keys, all_tids, side="left").astype(jnp.int32)
    ends_all = jnp.searchsorted(keys, all_tids, side="right").astype(jnp.int32)
    counts_all = jnp.minimum(ends_all - starts_all, cfg.run_cap)

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
        pg = pair_g[safe]
        return pg, in_run

    def batch_step(_, b):
        tids = b * TB + jnp.arange(TB, dtype=jnp.int32)
        start = starts_all[tids]
        count = counts_all[tids]
        px, pixid, valid_px = tile_geometry(tids)
        carry0 = init_carry((TB, tpx), done0=~valid_px)

        def run_step(carry, r):
            pg, in_run = gather_run(start, count, r)
            new_carry, w = blend_chunk(
                carry,
                px,
                t_xy[pg],
                t_conic[pg],
                t_op[pg],
                t_col[pg],
                t_depth[pg],
                in_run,
            )
            m = jnp.max(w, axis=1)  # (TB, Rs)
            arg = jnp.argmax(w, axis=1).astype(jnp.int32)
            apix = jnp.take_along_axis(pixid, arg, axis=1)
            gid = order[pg]  # original Gaussian index
            return new_carry, (m, apix, gid)

        carry, (m, apix, gid) = jax.lax.scan(
            run_step, carry0, jnp.arange(steps, dtype=jnp.int32)
        )

        bg = jnp.float32(1.0 if white_bkgd else 0.0)
        tile_col = jnp.where(
            valid_px[..., None],
            carry.colour + carry.transmittance[..., None] * bg,
            0.0,
        )
        tile_ed = jnp.where(valid_px, carry.exp_depth, 0.0)
        tile_einv = jnp.where(valid_px, carry.exp_invdepth, 0.0)
        return None, (tile_col, tile_ed, tile_einv, m, apix, gid)

    _, (tiles_col, tiles_ed, tiles_einv, m_all, apix_all, gid_all) = jax.lax.scan(
        batch_step, None, jnp.arange(NB, dtype=jnp.int32)
    )

    # Tile-major -> row-major image assembly.
    def untile(t):  # t: (NB, TB, tpx[, 3])
        extra = t.shape[3:]
        t = t.reshape((NTP, tpx) + extra)[: cfg.num_tiles]
        t = t.reshape((cfg.grid_h, cfg.grid_w, cfg.tile, cfg.tile) + extra)
        t = jnp.swapaxes(t, 1, 2)
        return t.reshape((cfg.height_pad, cfg.width_pad) + extra)

    image = untile(tiles_col)
    ed = untile(tiles_ed)
    einv = untile(tiles_einv)

    # Per-Gaussian reductions (deterministic replacements for CUDA atomics).
    m_flat = m_all.reshape(-1)
    gid_flat = gid_all.reshape(-1)
    apix_flat = apix_all.reshape(-1)
    contrib = jax.ops.segment_max(
        m_flat, gid_flat, num_segments=P, indices_are_sorted=False
    )
    contrib = jnp.maximum(contrib, 0.0)  # empty segments -> 0 (CUDA init)

    hit = (m_flat > 0.0) & (m_flat == contrib[gid_flat])
    pix_cand = jnp.where(hit, apix_flat, -1)
    best_pix = jax.ops.segment_max(pix_cand, gid_flat, num_segments=P)
    best_pix = jnp.maximum(best_pix, -1)
    img_flat = image.reshape(-1, 3)
    best_colour = jnp.where(
        (best_pix >= 0)[:, None], img_flat[jnp.maximum(best_pix, 0)], 0.0
    )

    if calc_surface_distance:
        ed_tiles = tiles_ed.reshape(NTP, tpx)

        def surf_batch(_, b):
            tids = b * TB + jnp.arange(TB, dtype=jnp.int32)
            start = starts_all[tids]
            count = counts_all[tids]
            _, pixid, valid_px = tile_geometry(tids)
            ed_b = ed_tiles[tids]  # (TB, tpx)

            def surf_run(_, r):
                pg, in_run = gather_run(start, count, r)
                dist = jnp.abs(
                    t_depth[pg][:, None, :] - ed_b[:, :, None]
                )  # (TB, tpx, Rs)
                ok = valid_px[:, :, None] & in_run[:, None, :]
                dist = jnp.where(ok, dist, FLOAT_MAX)
                sd = jnp.min(dist, axis=1)  # (TB, Rs)
                return None, (sd, order[pg])

            _, (sd, gid) = jax.lax.scan(
                surf_run, None, jnp.arange(steps, dtype=jnp.int32)
            )
            return None, (sd, gid)

        _, (sd_all, sgid_all) = jax.lax.scan(
            surf_batch, None, jnp.arange(NB, dtype=jnp.int32)
        )
        surf = jax.ops.segment_min(
            sd_all.reshape(-1), sgid_all.reshape(-1), num_segments=P
        )
        surf = jnp.where(jnp.isinf(surf), FLOAT_MAX, surf)
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
    )

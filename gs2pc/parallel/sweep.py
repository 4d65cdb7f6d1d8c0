"""Multi-camera render sweep + per-Gaussian accumulators.

Reference parity: the per-camera python loop at gauss_to_pc.py:437-471 plus
the rasterizer-held accumulators (gaussian_pointcloud_rasterization/
__init__.py:58-77, :142-158):

  * gaussian_max_contribution   — running max of per-image max alpha*T
  * gaussian_colours            — rendered colour at the winning pixel
  * gaussian_total_contribution — SUM of per-image max contributions
  * gaussian_min_surface_distance — running min |depth - expected depth|

TPU redesign: the whole sweep is ONE jitted lax.scan over a stacked
CameraBatch (no per-camera dispatch), optionally shard_mapped over the
"cams" mesh axis with all-gather/argmax, psum and min combines replacing
the reference's (nonexistent) multi-device story.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gs2pc.camera import CameraBatch
from gs2pc.ops.blend import FLOAT_MAX, RenderOutput
from gs2pc.ops.dense_render import render_dense
from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from gs2pc.parallel.mesh import CAM_AXIS


class SweepAccumulators(NamedTuple):
    max_contribution: jnp.ndarray  # (P,)
    colours: jnp.ndarray  # (P, 3) rendered colour at best pixel, [0, 1]
    total_contribution: jnp.ndarray  # (P,)
    min_surface_distance: jnp.ndarray  # (P,)
    # (3,) f32 summed truncation counters over the whole sweep:
    # [pairs blended, window-truncated candidates, run-cap-dropped pairs].
    # Observability for the static-capacity knobs (slots / run_cap) — the
    # reference renders every covered tile with no cap, so any nonzero
    # drop count here is a quality signal the user must be able to see.
    # None when unknown (e.g. resumed from a legacy checkpoint); the
    # default is None rather than jnp.zeros so importing this module never
    # initialises a jax backend.
    n_dropped: jnp.ndarray | None = None


def init_accumulators(num_gaussians: int) -> SweepAccumulators:
    return SweepAccumulators(
        max_contribution=jnp.zeros(num_gaussians, jnp.float32),
        colours=jnp.zeros((num_gaussians, 3), jnp.float32),
        total_contribution=jnp.zeros(num_gaussians, jnp.float32),
        min_surface_distance=jnp.full(num_gaussians, FLOAT_MAX, jnp.float32),
        n_dropped=jnp.zeros(4, jnp.float32),
    )


def update_accumulators(
    acc: SweepAccumulators, out: RenderOutput
) -> SweepAccumulators:
    """update_max_contributions + update_min_surface_distances semantics."""
    upd = out.contrib > acc.max_contribution
    return SweepAccumulators(
        max_contribution=jnp.where(upd, out.contrib, acc.max_contribution),
        colours=jnp.where(upd[:, None], out.best_colour, acc.colours),
        total_contribution=acc.total_contribution + out.contrib,
        min_surface_distance=jnp.minimum(
            acc.min_surface_distance, out.surf_dist
        ),
        n_dropped=(
            acc.n_dropped if out.n_dropped is None or acc.n_dropped is None
            else acc.n_dropped + out.n_dropped
        ),
    )


def _render_one(
    scene_arrays,
    camera,
    mask,
    renderer: str,
    cfg: TileConfig,
    white_bkgd: bool,
    antialiasing: bool,
    calc_surface_distance: bool,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
) -> RenderOutput:
    means, covf, opac, cols, alive = scene_arrays
    if mask is not None:
        # CameraBatch masks arrive bit-packed (camera.py); renderers
        # want per-pixel uint8.
        from gs2pc.camera import unpack_mask_bits

        mask = unpack_mask_bits(mask, cfg.width_pad * cfg.height_pad)
    if shs is not None:
        # Full view-dependent SH colour per camera (the capability of the
        # reference CUDA kernel's computeColorFromSH path, forward.cu:24-73;
        # the reference pipeline itself always precomputes deg-0 colours).
        from gs2pc.ops.sh import eval_sh_rgb

        dirs = means - camera.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        cols = eval_sh_rgb(sh_degree, shs, dirs)
    if renderer == "dense":
        return render_dense(
            means, covf, opac, cols, alive, camera,
            cfg.width_pad, cfg.height_pad,
            chunk=cfg.run_chunk,
            white_bkgd=white_bkgd,
            antialiasing=antialiasing,
            calc_surface_distance=calc_surface_distance,
            mask=mask,
        )
    return render_tile_camera(
        means, covf, opac, cols, alive, camera, cfg,
        mask=mask,
        white_bkgd=white_bkgd,
        antialiasing=antialiasing,
        calc_surface_distance=calc_surface_distance,
        use_pallas=use_pallas,
    )


def merge_accumulators(
    a: SweepAccumulators, b: SweepAccumulators
) -> SweepAccumulators:
    """Merge accumulators from two disjoint camera subsets, `b`'s cameras
    coming after `a`'s.  Ties keep `a` — the same first-camera-wins rule as
    update_accumulators' strict `>` — so splitting a sweep into dispatches
    and merging reproduces the monolithic winner exactly."""
    upd = b.max_contribution > a.max_contribution
    if a.n_dropped is None or b.n_dropped is None:
        nd = a.n_dropped if b.n_dropped is None else b.n_dropped
    else:
        nd = a.n_dropped + b.n_dropped
    return SweepAccumulators(
        max_contribution=jnp.where(upd, b.max_contribution, a.max_contribution),
        colours=jnp.where(upd[:, None], b.colours, a.colours),
        total_contribution=a.total_contribution + b.total_contribution,
        min_surface_distance=jnp.minimum(
            a.min_surface_distance, b.min_surface_distance
        ),
        n_dropped=nd,
    )


def render_sweep(
    scene_arrays,
    cameras: CameraBatch,
    cfg: TileConfig,
    renderer: str = "tile",
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
    acc0: SweepAccumulators | None = None,
) -> SweepAccumulators:
    """Sequential (single-device) sweep: lax.scan over stacked cameras.

    ``acc0`` continues a partial sweep (the dispatch-bounded driver below
    feeds each chunk the previous chunk's carry) — byte-identical to one
    monolithic scan because the per-camera update order is unchanged."""
    P_num = scene_arrays[0].shape[0]
    if acc0 is None:
        acc0 = init_accumulators(P_num)

    has_mask = cameras.mask is not None

    def step(acc, cam_slice):
        cam, mask = cam_slice
        out = _render_one(
            scene_arrays, cam, mask if has_mask else None,
            renderer, cfg, white_bkgd, antialiasing, calc_surface_distance,
            shs=shs, sh_degree=sh_degree, use_pallas=use_pallas,
        )
        return update_accumulators(acc, out), None

    cams_nomask = dataclasses.replace(cameras, mask=None)
    masks = cameras.mask if has_mask else jnp.zeros(
        (cameras.num_cameras, 1), jnp.uint8
    )
    acc, _ = jax.lax.scan(step, acc0, (cams_nomask, masks))
    return acc


def pad_cameras(cameras: CameraBatch, multiple: int) -> CameraBatch:
    """Pad the camera axis with inert zero-size cameras (render nothing)."""
    n = cameras.num_cameras
    n_pad = -(-n // multiple) * multiple
    extra = n_pad - n
    if extra == 0:
        return cameras

    def pad(x, identity=False):
        if x is None:
            return None
        fill = jnp.eye(4, dtype=x.dtype) if identity else jnp.zeros(
            x.shape[1:], x.dtype
        )
        tail = jnp.broadcast_to(fill, (extra,) + x.shape[1:])
        return jnp.concatenate([x, tail], axis=0)

    return CameraBatch(
        viewmatrix=pad(cameras.viewmatrix, identity=True),
        projmatrix=pad(cameras.projmatrix, identity=True),
        campos=pad(cameras.campos),
        tanfovx=pad(cameras.tanfovx),
        tanfovy=pad(cameras.tanfovy),
        focal_x=pad(cameras.focal_x),
        focal_y=pad(cameras.focal_y),
        width=pad(cameras.width),  # zero width/height => every pixel culled
        height=pad(cameras.height),
        mask=pad(cameras.mask),
    )


# Splat-tile pairs of sort+blend work per dispatch.  The camera sweep is
# split into multiple jit dispatches of at most this much work so that no
# single device program runs unboundedly long: some TPU serving stacks
# (including the tunnelled backend this project is benchmarked on) kill
# any single dispatch running longer than ~60 s.  2^27 pairs is ~7-15 s
# per dispatch at production budgets; the per-dispatch overhead is the
# ~30 ms launch floor, <1% at that grain.
PAIRS_PER_DISPATCH = 1 << 27


def auto_dispatch_cams(
    cfg: TileConfig, num_gaussians: int, n_cams: int, requested: int = 0
) -> int:
    """Cameras per dispatch: explicit request, or sized from the pair
    budget so each dispatch stays well under the watchdog (0 = auto).

    Auto prefers a DIVISOR of the camera count near the budget-derived
    size: the remainder dispatch otherwise pads with inert cameras that
    still pay the full per-camera expansion+sort."""
    if requested > 0:
        return min(requested, n_cams)
    budget = max(cfg.pair_budget_for(num_gaussians), 1)
    k = max(1, min(n_cams, PAIRS_PER_DISPATCH // budget))
    if k >= n_cams:
        return n_cams
    hi = min(n_cams, k + (k + 3) // 4)  # allow ~25% over the target
    for cand in range(hi, max(1, k // 2) - 1, -1):
        if n_cams % cand == 0:
            return cand
    return k


def slice_cameras(cameras: CameraBatch, start: int, count: int) -> CameraBatch:
    """Static slice [start, start+count) along the camera axis."""
    return jax.tree.map(
        lambda x: jax.lax.slice_in_dim(x, start, start + count, axis=0)
        if hasattr(x, "shape") else x,
        cameras,
    )


@functools.lru_cache(maxsize=64)
def _chunk_step(
    cfg: TileConfig, renderer, white_bkgd, antialiasing,
    calc_surface_distance, sh_degree, use_pallas,
):
    """One jitted sweep program per static-knob combination — reused
    across every dispatch of a chunked sweep AND across repeat calls, so
    re-invoking the chunked driver never retraces."""
    return jax.jit(
        functools.partial(
            render_sweep,
            cfg=cfg, renderer=renderer, white_bkgd=white_bkgd,
            antialiasing=antialiasing,
            calc_surface_distance=calc_surface_distance,
            sh_degree=sh_degree, use_pallas=use_pallas,
        )
    )


@functools.lru_cache(maxsize=64)
def _chunk_step_sliced(
    cfg: TileConfig, renderer, white_bkgd, antialiasing,
    calc_surface_distance, sh_degree, use_pallas, k: int,
):
    """Chunk step that slices its k-camera window INSIDE the jit.

    The host loop previously sliced the camera batch eagerly — ~8 tiny
    device ops per dispatch, each paying the backend's ~30 ms dispatch
    floor (over a second across a 45-camera sweep, worse in congested
    tunnel phases).  Taking the dispatch offset as a TRACED scalar keeps
    one compiled program for every dispatch while the slicing fuses into
    the sweep program itself."""

    def run(scene_arrays, cameras_pad, i, shs, acc0):
        cams = jax.tree.map(
            lambda x: (
                jax.lax.dynamic_slice_in_dim(x, i, k, axis=0)
                if hasattr(x, "shape") else x
            ),
            cameras_pad,
        )
        return render_sweep(
            scene_arrays, cams,
            cfg=cfg, renderer=renderer, white_bkgd=white_bkgd,
            antialiasing=antialiasing,
            calc_surface_distance=calc_surface_distance,
            sh_degree=sh_degree, use_pallas=use_pallas,
            shs=shs, acc0=acc0,
        )

    return jax.jit(run)


def render_sweep_chunked(
    scene_arrays,
    cameras: CameraBatch,
    cfg: TileConfig,
    renderer: str = "tile",
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
    dispatch_cams: int = 0,
) -> SweepAccumulators:
    """Single-device sweep split into bounded jit dispatches.

    One compiled program (cameras pad to a dispatch multiple with inert
    entries) re-dispatched with the carried accumulators — byte-identical
    to the monolithic scan, but no dispatch exceeds ~PAIRS_PER_DISPATCH
    pairs of work (see the watchdog note above)."""
    P_num = scene_arrays[0].shape[0]
    n = cameras.num_cameras
    k = auto_dispatch_cams(cfg, P_num, n, dispatch_cams)

    if k >= n:
        step = _chunk_step(
            cfg, renderer, white_bkgd, antialiasing, calc_surface_distance,
            sh_degree, use_pallas,
        )
        return step(scene_arrays, cameras, shs=shs)

    step = _chunk_step_sliced(
        cfg, renderer, white_bkgd, antialiasing, calc_surface_distance,
        sh_degree, use_pallas, k,
    )
    cameras = pad_cameras(cameras, k)
    acc = init_accumulators(P_num)
    prev = None  # (done_count, acc) of the dispatch before the one in flight
    for i in range(0, cameras.num_cameras, k):
        acc = step(scene_arrays, cameras, jnp.int32(i), shs, acc)
        # Report the PREVIOUS dispatch now that the next one is enqueued:
        # reading the pair counter syncs on its dispatch, and syncing on
        # the one just queued would stall the host between dispatches
        # (measured ~a tunnel round-trip each on the tunnelled backend).
        if prev is not None:
            report_sweep_progress(prev[0], n, prev[1])
        prev = (min(i + k, n), acc)
    if prev is not None and n > 1:
        report_sweep_progress(prev[0], n, prev[1])
    return acc


def report_sweep_progress(done: int, total: int, acc: SweepAccumulators):
    """Per-dispatch progress line (parity: the reference's per-camera tqdm
    loop, gauss_to_pc.py:437 — a production sweep must never go silent for
    the whole run).  Reading the pair counter syncs on the dispatch just
    queued; dispatches are serial through the carried accumulators anyway,
    so this costs one scalar transfer, not pipelining."""
    from gs2pc.utils import log

    if total <= 1 or log.is_quiet():
        # Quiet mode must skip the WHOLE body: the pair-counter read is
        # a device->host scalar fetch that syncs the queued dispatch —
        # on a tunnelled link that is a real round-trip per dispatch,
        # paid for a line that would be discarded anyway.
        return
    if acc.n_dropped is not None:
        pairs = float(acc.n_dropped[0])
        log.info(
            f"  rendered {min(done, total)}/{total} cameras "
            f"({pairs:,.0f} pairs blended)"
        )
    else:
        log.info(f"  rendered {min(done, total)}/{total} cameras")


def render_sweep_sharded(
    scene_arrays,
    cameras: CameraBatch,
    cfg: TileConfig,
    mesh,
    renderer: str = "tile",
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
) -> SweepAccumulators:
    """Camera-data-parallel sweep over the "cams" mesh axis.

    Each device scans its camera shard locally, then accumulators combine:
    total <- psum; surface distance <- min over devices; (max, colour) <-
    argmax-combine via a small all_gather (deterministic tie-break by
    device order, unlike the reference's atomics).
    """
    n_dev = mesh.shape[CAM_AXIS]
    cameras = pad_cameras(cameras, n_dev)

    cam_spec = jax.tree.map(lambda _: P(CAM_AXIS), cameras)
    scene_spec = jax.tree.map(lambda _: P(), scene_arrays)
    # shs threaded explicitly (replicated) — shard_map must see it as an arg.
    shs_arg = shs if shs is not None else jnp.zeros((1,), jnp.float32)
    has_shs = shs is not None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(scene_spec, cam_spec, P()),
        out_specs=jax.tree.map(lambda _: P(), init_accumulators(1)),
        # blend-scan carries start as replicated constants and become
        # device-varying after the first camera; skip the vma check.
        check_vma=False,
    )
    def sharded(scene_local, cams_local, shs_local):
        acc = render_sweep(
            scene_local, cams_local, cfg, renderer,
            white_bkgd, antialiasing, calc_surface_distance,
            shs=shs_local if has_shs else None,
            sh_degree=sh_degree, use_pallas=use_pallas,
        )
        total = jax.lax.psum(acc.total_contribution, CAM_AXIS)
        sd = jax.lax.pmin(acc.min_surface_distance, CAM_AXIS)
        nd = jax.lax.psum(acc.n_dropped, CAM_AXIS)
        gmax_all = jax.lax.all_gather(acc.max_contribution, CAM_AXIS)  # (D, P)
        gcol_all = jax.lax.all_gather(acc.colours, CAM_AXIS)  # (D, P, 3)
        winner = jnp.argmax(gmax_all, axis=0)  # (P,)
        gmax = jnp.max(gmax_all, axis=0)
        gcol = jnp.take_along_axis(gcol_all, winner[None, :, None], axis=0)[0]
        return SweepAccumulators(gmax, gcol, total, sd, nd)

    return sharded(scene_arrays, cameras, shs_arg)

"""Gaussian-axis (depth-slab) sharded renderer.

The reference has no multi-GPU story (SURVEY §2: hard-coded ``cuda:0``);
camera data parallelism (parallel/sweep.py) is gs2pc's first scaling
axis.  This module adds the second: the GAUSSIAN axis — this workload's
analogue of sequence parallelism (SURVEY §5).  Alpha compositing is
associative over depth-ordered segments,

    (C1, T1) ⊕ (C2, T2) = (C1 + T1 · C2,  T1 · T2),

so each device composites one contiguous DEPTH SLAB of the scene and the
slabs combine with a handful of XLA collectives over the mesh.

Per camera, on device d of D (scene replicated):

 1. slab assignment: depth quantile boundaries from a strided sample of
    in-frustum view depths — computed identically on every device from
    replicated inputs, ties kept in one slab;
 2. pass 1: trigger-free alpha product over the local slab
    (``early_stop=False``) → per-pixel slab transmittance T_d.  The
    trigger-free product is what makes the decomposition exact; XLA
    dead-code-eliminates pass 1's unused colour work;
 3. ``all_gather(T)`` → exclusive prefix t0_d = Π_{d'<d} T_{d'};
 4. pass 2: full blend with ``init_trans=t0_d`` → ABSOLUTE colour /
    depth contributions and exact per-Gaussian accumulators (a pixel
    whose upstream product fell below T_EPS triggers immediately, which
    reproduces the single-device early-stop);
 5. combine: image / expected depth / inverse depth ``psum``;
    max-contribution ``pmax``; min-surface-distance ``pmin`` (pass 3
    re-runs the surface sweep against the psum'd GLOBAL expected-depth
    map); colour-at-argmax-pixel re-gathered from the GLOBAL image and
    ``psum``'d (each Gaussian lives in exactly one slab, so exactly one
    device contributes a non-zero row).

Known divergences vs the single-device renderer (documented, tested):
(a) the background term on early-stopped pixels uses the trigger-free
transmittance product, which differs from the stopped value by less
than T_EPS = 1e-4; (b) the per-tile ``run_cap`` truncation applies per
SLAB, so a tile that saturates the cap blends up to D x run_cap pairs —
strictly MORE of the scene than the single-device truncation keeps
(closer to the uncapped exact result, not bit-equal to one device);
(c) the pair-budget waterfill applies per-slab (each slab derives its
budget from its compacted P_slab), so an oversubscribed scene truncates
slightly differently across device counts.  Away from those caps
everything matches to f32 summation order.

Scaling (v2): each device COMPACTS its depth slab to a fixed-size
P_slab ~ 1.25 * P/D buffer before preprocessing, so projection, pair
expansion, and the per-device sort all scale ~1/D (v1 replicated them at
full P).  The quantile slab assignment keeps slab populations within
sampling error of P_in_frustum/D; Gaussians beyond the 25% slack are
dropped for that camera and counted in the window-truncation diagnostic
(n_dropped[1]).  Per-Gaussian outputs scatter back to the full axis
through the compaction index (unique per device — conflict-free).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gs2pc.camera import CameraBatch
from gs2pc.ops.blend import FLOAT_MAX, RenderOutput
from gs2pc.ops.linalg3 import dotrow3
from gs2pc.ops.projection import NEAR_Z
from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from gs2pc.parallel.sweep import (
    SweepAccumulators,
    init_accumulators,
    update_accumulators,
)

GAUSS_AXIS = "gauss"

_SLAB_SAMPLE = 4096  # strided depth sample for quantile boundaries


def make_gauss_mesh(num_devices: int = 0, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (GAUSS_AXIS,))


def _slab_mask(means, viewmatrix, alive, d, n_dev):
    """Deterministic depth-slab assignment (identical on every device)."""
    # Exact-f32 row transform (linalg3): slab assignment must agree
    # bit-for-bit with preprocess()'s depths across programs/devices.
    depth = dotrow3(means, viewmatrix[2, :3], viewmatrix[2, 3])
    assignable = alive & (depth > NEAR_Z)

    p = means.shape[0]
    stride = max(p // _SLAB_SAMPLE, 1)
    samp = jnp.where(assignable[::stride], depth[::stride], FLOAT_MAX)
    samp_sorted = jnp.sort(samp)
    n_ok = jnp.sum(samp < FLOAT_MAX)
    qidx = (n_ok * jnp.arange(1, n_dev)) // n_dev
    bounds = samp_sorted[jnp.clip(qidx, 0, samp.shape[0] - 1)]
    # side="right": Gaussians exactly on a boundary all land in the same
    # slab, so equal depths never straddle a device split.
    slab = jnp.searchsorted(bounds, depth, side="right").astype(jnp.int32)
    return assignable & (slab == d)


def slab_capacity(p: int, n_dev: int, slack: float = 1.25) -> int:
    """Static per-device slab buffer size: ~P/D with 25% quantile-error
    slack, rounded to a lane-friendly multiple of 256, capped at P."""
    base = -(-p // max(n_dev, 1))
    cap = int(base * slack) + 256
    return min(-(-cap // 256) * 256, p)


def _render_one_gauss_sharded(
    arrays,
    camera,
    mask,
    d,
    n_dev: int,
    cfg: TileConfig,
    white_bkgd: bool,
    antialiasing: bool,
    calc_surface_distance: bool,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
) -> RenderOutput:
    means, covf, opac, cols, alive = arrays
    p_full = means.shape[0]
    if mask is not None:
        # CameraBatch masks arrive bit-packed (camera.py).
        from gs2pc.camera import unpack_mask_bits

        mask = unpack_mask_bits(mask, cfg.width_pad * cfg.height_pad)
    alive_d = _slab_mask(means, camera.viewmatrix, alive, d, n_dev)

    # --- slab compaction: P -> P_slab ~ 1.25 P/D ---------------------- #
    p_slab = slab_capacity(p_full, n_dev)
    idx = jnp.nonzero(alive_d, size=p_slab, fill_value=p_full)[0].astype(
        jnp.int32
    )
    s_ok = idx < p_full
    safe = jnp.minimum(idx, p_full - 1)
    overflow = jnp.maximum(
        jnp.sum(alive_d.astype(jnp.int32)) - p_slab, 0
    ).astype(jnp.float32)
    s_means = means[safe]
    s_covf = covf[safe]
    s_opac = opac[safe]
    s_cols = cols[safe]

    def scatter_to_full(v, fill=0.0):
        """(P_slab[, k]) slab values -> (P[, k]) full axis (unique idx)."""
        full = jnp.full((p_full + 1,) + v.shape[1:], fill, v.dtype)
        vv = jnp.where(
            s_ok.reshape((-1,) + (1,) * (v.ndim - 1)), v,
            jnp.asarray(fill, v.dtype),
        )
        return full.at[jnp.minimum(idx, p_full)].set(vv)[:p_full]

    if shs is not None:
        # Per-camera view-dependent SH colours (same capability as the
        # camera-DP sweep, parallel/sweep.py _render_one) — evaluated on
        # the compacted slab only.
        from gs2pc.ops.sh import eval_sh_rgb

        s_shs = shs[safe]
        dirs = s_means - camera.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        s_cols = eval_sh_rgb(sh_degree, s_shs, dirs)

    common = dict(
        mask=mask,
        white_bkgd=False,  # background added once after the psum
        antialiasing=antialiasing,
        use_pallas=use_pallas,
    )

    # Pass 1: trigger-free slab transmittance.
    p1 = render_tile_camera(
        s_means, s_covf, s_opac, s_cols, s_ok, camera, cfg,
        calc_surface_distance=False,
        early_stop=False,
        want_trans=True,
        **common,
    )
    t_d = p1.trans.reshape(-1)  # (Hp*Wp,)
    all_t = jax.lax.all_gather(t_d, GAUSS_AXIS)  # (D, Npx)
    before = (jnp.arange(n_dev) < d)[:, None]
    t0 = jnp.prod(jnp.where(before, all_t, 1.0), axis=0)
    t_global = jnp.prod(all_t, axis=0)

    # Pass 2: absolute contributions with the upstream prefix.
    p2 = render_tile_camera(
        s_means, s_covf, s_opac, s_cols, s_ok, camera, cfg,
        calc_surface_distance=False,
        init_trans=t0,
        want_best_pix=True,
        **common,
    )

    image = jax.lax.psum(p2.image, GAUSS_AXIS)
    if white_bkgd:
        image = image + t_global.reshape(image.shape[:2])[..., None]
    ed = jax.lax.psum(p2.depth, GAUSS_AXIS)
    einv = jax.lax.psum(p2.invdepth, GAUSS_AXIS)
    contrib = jax.lax.pmax(scatter_to_full(p2.contrib), GAUSS_AXIS)

    # Colour at the argmax pixel must come from the GLOBAL image.
    best_slab = jnp.where(
        (p2.contrib > 0.0)[:, None],
        image.reshape(-1, 3)[p2.best_pix],
        0.0,
    )
    best_colour = jax.lax.psum(scatter_to_full(best_slab), GAUSS_AXIS)

    if calc_surface_distance:
        # Pass 3: surface sweep against the global expected-depth map
        # (the blend subgraph is shared with pass 2 under CSE).
        p3 = render_tile_camera(
            s_means, s_covf, s_opac, s_cols, s_ok, camera, cfg,
            calc_surface_distance=True,
            init_trans=t0,
            surface_ed_override=ed.reshape(-1),
            **common,
        )
        surf = jax.lax.pmin(
            scatter_to_full(p3.surf_dist, fill=FLOAT_MAX), GAUSS_AXIS
        )
    else:
        surf = jnp.full(p_full, FLOAT_MAX, jnp.float32)

    # Truncation counters: each device counted its own slab; the global
    # per-camera figure is their sum (note run_cap truncation is per SLAB
    # here — see the module docstring's divergence (b)).  Slab-buffer
    # overflow (Gaussians beyond the 25% compaction slack, dropped this
    # camera) is folded into the window-truncation counter.
    n_dropped = (
        None if p2.n_dropped is None
        else jax.lax.psum(
            p2.n_dropped + jnp.stack(
                [jnp.float32(0.0), overflow, jnp.float32(0.0),
                 jnp.float32(0.0)]
            ),
            GAUSS_AXIS,
        )
    )

    return RenderOutput(
        image=image,
        depth=ed,
        invdepth=einv,
        radii=jnp.zeros(p_full, jnp.float32),  # unused by the accumulators
        contrib=contrib,
        best_colour=best_colour,
        surf_dist=surf,
        n_dropped=n_dropped,
    )


def render_sweep_gauss_sharded(
    scene_arrays,
    cameras: CameraBatch,
    cfg: TileConfig,
    mesh: Mesh,
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
) -> SweepAccumulators:
    """Camera sweep with the Gaussian axis depth-slab sharded over ``mesh``.

    The scene is replicated; every device walks ALL cameras (the camera
    loop is sequential as in parallel/sweep.py) and renders only its
    depth slab per camera.  Accumulators come out replicated.
    """
    n_dev = mesh.shape[GAUSS_AXIS]
    p_num = scene_arrays[0].shape[0]

    has_mask = cameras.mask is not None
    cams_nomask = dataclasses.replace(cameras, mask=None)
    masks = cameras.mask if has_mask else jnp.zeros(
        (cameras.num_cameras, 1), jnp.uint8
    )
    has_shs = shs is not None
    shs_arg = shs if has_shs else jnp.zeros((1,), jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene_arrays),
            jax.tree.map(lambda _: P(), cams_nomask),
            P(),
            P(),
        ),
        out_specs=jax.tree.map(lambda _: P(), init_accumulators(1)),
        check_vma=False,
    )
    def sharded(scene_local, cams_local, masks_local, shs_local):
        d = jax.lax.axis_index(GAUSS_AXIS)
        acc0 = init_accumulators(p_num)

        def step(acc, cam_slice):
            cam, m = cam_slice
            out = _render_one_gauss_sharded(
                scene_local, cam, m if has_mask else None,
                d, n_dev, cfg, white_bkgd, antialiasing,
                calc_surface_distance,
                shs=shs_local if has_shs else None,
                sh_degree=sh_degree,
                use_pallas=use_pallas,
            )
            return update_accumulators(acc, out), None

        acc, _ = jax.lax.scan(step, acc0, (cams_local, masks_local))
        return acc

    return sharded(scene_arrays, cams_nomask, masks, shs_arg)


def make_2d_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """Near-square ("cams", "gauss") mesh: the largest divisor of D that
    is <= sqrt(D) becomes the camera axis (cameras are usually the
    scarcer resource; the Gaussian axis scales smoothly via slabs)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    d = len(devices)
    cams_dev = 1
    for c in range(int(np.sqrt(d)), 0, -1):
        if d % c == 0:
            cams_dev = c
            break
    from gs2pc.parallel.mesh import CAM_AXIS

    return Mesh(
        np.asarray(devices).reshape(cams_dev, d // cams_dev),
        (CAM_AXIS, GAUSS_AXIS),
    )


def render_sweep_2d(
    scene_arrays,
    cameras: CameraBatch,
    cfg: TileConfig,
    mesh: Mesh,
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
    shs=None,
    sh_degree: int = 3,
    use_pallas: bool = False,
) -> SweepAccumulators:
    """Camera-DP x Gaussian-slab 2-D sharded sweep.

    Cameras split over the "cams" mesh axis; within each camera the
    Gaussian depth slabs split over "gauss" (see
    render_sweep_gauss_sharded).  Per-camera combines ride the gauss
    axis; the cross-camera accumulator combines (psum / pmin /
    all_gather-argmax, mirroring parallel/sweep.py) ride the cams axis.
    """
    from gs2pc.parallel.mesh import CAM_AXIS
    from gs2pc.parallel.sweep import pad_cameras

    n_gauss_dev = mesh.shape[GAUSS_AXIS]
    n_cam_dev = mesh.shape[CAM_AXIS]
    p_num = scene_arrays[0].shape[0]
    cameras = pad_cameras(cameras, n_cam_dev)

    has_mask = cameras.mask is not None
    cams_nomask = dataclasses.replace(cameras, mask=None)
    masks = cameras.mask if has_mask else jnp.zeros(
        (cameras.num_cameras, 1), jnp.uint8
    )
    has_shs = shs is not None
    shs_arg = shs if has_shs else jnp.zeros((1,), jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene_arrays),
            jax.tree.map(lambda _: P(CAM_AXIS), cams_nomask),
            P(CAM_AXIS),
            P(),
        ),
        out_specs=jax.tree.map(lambda _: P(), init_accumulators(1)),
        check_vma=False,
    )
    def sharded(scene_local, cams_local, masks_local, shs_local):
        d = jax.lax.axis_index(GAUSS_AXIS)
        acc0 = init_accumulators(p_num)

        def step(acc, cam_slice):
            cam, m = cam_slice
            out = _render_one_gauss_sharded(
                scene_local, cam, m if has_mask else None,
                d, n_gauss_dev, cfg, white_bkgd, antialiasing,
                calc_surface_distance,
                shs=shs_local if has_shs else None,
                sh_degree=sh_degree,
                use_pallas=use_pallas,
            )
            return update_accumulators(acc, out), None

        acc, _ = jax.lax.scan(step, acc0, (cams_local, masks_local))

        # Cross-camera combine over the "cams" axis (sweep.py semantics).
        total = jax.lax.psum(acc.total_contribution, CAM_AXIS)
        sd = jax.lax.pmin(acc.min_surface_distance, CAM_AXIS)
        nd = jax.lax.psum(acc.n_dropped, CAM_AXIS)
        gmax_all = jax.lax.all_gather(acc.max_contribution, CAM_AXIS)
        gcol_all = jax.lax.all_gather(acc.colours, CAM_AXIS)
        winner = jnp.argmax(gmax_all, axis=0)
        gmax = jnp.max(gmax_all, axis=0)
        gcol = jnp.take_along_axis(gcol_all, winner[None, :, None], axis=0)[0]
        return SweepAccumulators(gmax, gcol, total, sd, nd)

    return sharded(scene_arrays, cams_nomask, masks, shs_arg)

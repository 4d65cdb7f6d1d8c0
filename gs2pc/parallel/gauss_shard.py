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
(c) big_cap window-overflow truncation is likewise per-slab.  Away from
those caps everything matches to f32 summation order.

Scaling note (v1): preprocessing and pair expansion still run over the
full replicated Gaussian axis on every device — only the blend work
(the dominant cost) is divided by D.  Compacting each slab before
expansion is the follow-up if P-scaling ever dominates.
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
    depth = means @ viewmatrix[2, :3].T + viewmatrix[2, 3]
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
) -> RenderOutput:
    means, covf, opac, cols, alive = arrays
    alive_d = _slab_mask(means, camera.viewmatrix, alive, d, n_dev)

    common = dict(
        mask=mask,
        white_bkgd=False,  # background added once after the psum
        antialiasing=antialiasing,
    )

    # Pass 1: trigger-free slab transmittance.
    p1 = render_tile_camera(
        means, covf, opac, cols, alive_d, camera, cfg,
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
        means, covf, opac, cols, alive_d, camera, cfg,
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
    contrib = jax.lax.pmax(p2.contrib, GAUSS_AXIS)

    # Colour at the argmax pixel must come from the GLOBAL image.
    best_local = jnp.where(
        (p2.contrib > 0.0)[:, None],
        image.reshape(-1, 3)[p2.best_pix],
        0.0,
    )
    best_colour = jax.lax.psum(best_local, GAUSS_AXIS)

    if calc_surface_distance:
        # Pass 3: surface sweep against the global expected-depth map
        # (the blend subgraph is shared with pass 2 under CSE).
        p3 = render_tile_camera(
            means, covf, opac, cols, alive_d, camera, cfg,
            calc_surface_distance=True,
            init_trans=t0,
            surface_ed_override=ed.reshape(-1),
            **common,
        )
        surf = jax.lax.pmin(p3.surf_dist, GAUSS_AXIS)
    else:
        surf = jnp.full(means.shape[0], FLOAT_MAX, jnp.float32)

    return RenderOutput(
        image=image,
        depth=ed,
        invdepth=einv,
        radii=p2.radii,
        contrib=contrib,
        best_colour=best_colour,
        surf_dist=surf,
    )


def render_sweep_gauss_sharded(
    scene_arrays,
    cameras: CameraBatch,
    cfg: TileConfig,
    mesh: Mesh,
    white_bkgd: bool = True,
    antialiasing: bool = False,
    calc_surface_distance: bool = True,
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

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene_arrays),
            jax.tree.map(lambda _: P(), cams_nomask),
            P(),
        ),
        out_specs=jax.tree.map(lambda _: P(), init_accumulators(1)),
        check_vma=False,
    )
    def sharded(scene_local, cams_local, masks_local):
        d = jax.lax.axis_index(GAUSS_AXIS)
        acc0 = init_accumulators(p_num)

        def step(acc, cam_slice):
            cam, m = cam_slice
            out = _render_one_gauss_sharded(
                scene_local, cam, m if has_mask else None,
                d, n_dev, cfg, white_bkgd, antialiasing,
                calc_surface_distance,
            )
            return update_accumulators(acc, out), None

        acc, _ = jax.lax.scan(step, acc0, (cams_local, masks_local))
        return acc

    return sharded(scene_arrays, cams_nomask, masks)


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

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene_arrays),
            jax.tree.map(lambda _: P(CAM_AXIS), cams_nomask),
            P(CAM_AXIS),
        ),
        out_specs=jax.tree.map(lambda _: P(), init_accumulators(1)),
        check_vma=False,
    )
    def sharded(scene_local, cams_local, masks_local):
        d = jax.lax.axis_index(GAUSS_AXIS)
        acc0 = init_accumulators(p_num)

        def step(acc, cam_slice):
            cam, m = cam_slice
            out = _render_one_gauss_sharded(
                scene_local, cam, m if has_mask else None,
                d, n_gauss_dev, cfg, white_bkgd, antialiasing,
                calc_surface_distance,
            )
            return update_accumulators(acc, out), None

        acc, _ = jax.lax.scan(step, acc0, (cams_local, masks_local))

        # Cross-camera combine over the "cams" axis (sweep.py semantics).
        total = jax.lax.psum(acc.total_contribution, CAM_AXIS)
        sd = jax.lax.pmin(acc.min_surface_distance, CAM_AXIS)
        gmax_all = jax.lax.all_gather(acc.max_contribution, CAM_AXIS)
        gcol_all = jax.lax.all_gather(acc.colours, CAM_AXIS)
        winner = jnp.argmax(gmax_all, axis=0)
        gmax = jnp.max(gmax_all, axis=0)
        gcol = jnp.take_along_axis(gcol_all, winner[None, :, None], axis=0)[0]
        return SweepAccumulators(gmax, gcol, total, sd)

    return sharded(scene_arrays, cams_nomask, masks)

"""Dispatch loader for Gaussian scene files (parity: gauss_dataloader.py:204-211)."""

from __future__ import annotations

import concurrent.futures as _cf
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gs2pc.io.ply import load_ply_gaussians
from gs2pc.io.splat import load_splat_gaussians
from gs2pc.models.gaussians import Gaussians, upload_f32


class HostScene(NamedTuple):
    """Host-memory mirror of the geometry planes the point sampler reads.

    Rows are index-aligned with the device ``Gaussians`` (the pipeline
    never compacts).  Kept so the sampler can run on the host CPU when
    the device->host link is slow: re-deriving 10M point positions from
    these ~120 MB of per-Gaussian factors beats fetching the 120 MB
    position buffer over a slow link (pipeline.py host-sampling path).
    """

    xyz: np.ndarray  # (P, 3) f32
    log_scales: np.ndarray  # (P, 3) f32
    rots: np.ndarray  # (P, 4) f32


@jax.jit
def _rots_from_xyz3(q3: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct wxyz unit quaternions from their xyz components.

    The loader sign-normalises quaternions to w >= 0, so
    w = sqrt(max(0, 1 - |xyz|^2)) exactly inverts the drop.  Worst-case
    reconstruction error is ~1e-4 absolute on near-180-degree rotations
    (cancellation in 1 - |xyz|^2), perturbing covariances relatively
    ~1e-4 — far below the blend's own 1/255 colour resolution; the host
    sampling mirror keeps the full 4-component host copy, so point
    positions are unaffected (see PARITY.md).
    """
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(q3 * q3, axis=1)))
    return jnp.concatenate([w[:, None], q3], axis=1)


@jax.jit
def _colours_from_u8(c8: jnp.ndarray) -> jnp.ndarray:
    return c8.astype(jnp.float32) / 255.0


def _resolve_compact_rots(compact_rots: Optional[bool]) -> bool:
    """Whether the rots plane crosses the wire as xyz-only (w dropped).

    The drop saves 1/4 of the plane's bytes but the device-side
    w = sqrt(1 - |xyz|^2) reconstruction injects ~1e-4 relative
    covariance error on near-180-degree rotations — worth it only on a
    slow transport (the tunnelled TPU at ~20 MB/s), and an exact-parity
    run can opt out.  ``GS2PC_COMPACT_UPLOAD`` in {auto,1,0} overrides;
    auto/unset = drop on TPU backends, full 4-component elsewhere."""
    env = os.environ.get("GS2PC_COMPACT_UPLOAD", "auto")
    if env == "1":
        return True
    if env == "0":
        return False
    if compact_rots is not None:
        return compact_rots
    from gs2pc.utils.platform import is_tpu_backend

    return is_tpu_backend()


def load_gaussians(
    input_path: str,
    max_sh_degree: int = 3,
    return_host: bool = False,
    compact_colours: bool = False,
    compact_rots: Optional[bool] = None,
):
    """Load a scene; with ``return_host`` also return the HostScene
    mirror (costs host RAM only — the arrays were parsed host-side
    anyway).

    Each plane's host->device transfer is STARTED the moment the parser
    finalises it (load_ply_gaussians' plane_hook) and is never blocked
    on here: on the tunnelled TPU the wire moves at ~20 MB/s, so the
    remaining parse work, the mask/camera setup, and the first sweep
    dispatch all hide under the seconds the scene takes to cross.  The
    device arrays are valid immediately (jax tracks the dependency); any
    residual wait lands in the first phase that actually consumes them.

    Wire-size reductions:
      * with ``compact_rots`` (default: TPU backends only; see
        _resolve_compact_rots) quaternions cross as xyz only and w is
        reconstructed device-side (the parser sign-normalises to
        w >= 0) — saves 1/4 of the plane at ~1e-4 worst-case
        covariance perturbation;
      * with ``compact_colours`` (the pipeline passes its production
        compact-pair setting) colours cross as uint8 quantised
        round-to-nearest — the EXACT quantisation the compact blend
        tables apply anyway (ops/rasterize.py::pack_blend_table rgb24),
        and f32 k/255 * 255 == k exactly for every k, so even
        unrendered-colour runs write identical bytes.
    """
    from gs2pc.utils import log

    drop_w = _resolve_compact_rots(compact_rots)
    planes: dict[str, object] = {}
    pool = _cf.ThreadPoolExecutor(2)

    def _upload(name: str, arr):
        if name == "rots" and drop_w:
            return jnp.asarray(np.ascontiguousarray(arr[:, 1:4], np.float32))
        if name == "colours" and compact_colours:
            c8 = np.round(
                np.clip(arr.astype(np.float32), 0.0, 1.0) * np.float32(255.0)
            ).astype(np.uint8)
            return jnp.asarray(c8)
        return upload_f32(arr)

    def hook(name: str, arr) -> None:
        if arr is None:
            planes[name] = None
            return
        planes[name] = pool.submit(_upload, name, arr)

    ext = os.path.splitext(input_path)[1]
    with log.phase("scene_parse"):
        if ext == ".splat":
            arrays = load_splat_gaussians(input_path)
        elif ext == ".ply":
            arrays = load_ply_gaussians(
                input_path, max_sh_degree=max_sh_degree, plane_hook=hook
            )
        else:
            raise AttributeError(f"Unsupported input type {ext}")
    xyz, log_scales, rots, colours, opacities, shs = arrays
    with log.phase("scene_upload"):
        if planes:
            # .ply path: transfers already in flight from the hook.
            def got(name):
                f = planes.get(name)
                return None if f is None else f.result()

            cols_d = got("colours")
            if compact_colours:
                cols_d = _colours_from_u8(cols_d)
            rots_d = got("rots")
            gaussians = Gaussians(
                xyz=got("xyz"),
                log_scales=got("log_scales"),
                rots=_rots_from_xyz3(rots_d) if drop_w else rots_d,
                opacities=got("opacities").reshape(-1),
                colours=cols_d,
                shs=got("shs") if "shs" in planes else None,
                normals=None,
                keep_mask=jnp.ones(xyz.shape[0], dtype=bool),
            )
        else:
            # .splat path: planes arrive together from the parser, so the
            # per-plane overlap above does not apply — fuse the five
            # host->device transfers into one (the tunnelled transport
            # charges ~0.4 s fixed overhead PER transfer).
            gaussians = Gaussians.create_fused(
                xyz, log_scales, rots, colours, opacities, shs=shs
            )
        pool.shutdown(wait=False)
    if not return_host:
        return gaussians
    host = HostScene(
        xyz=np.ascontiguousarray(xyz, np.float32),
        log_scales=np.ascontiguousarray(log_scales, np.float32),
        rots=np.ascontiguousarray(rots, np.float32),
    )
    return gaussians, host

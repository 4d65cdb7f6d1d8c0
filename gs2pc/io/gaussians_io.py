"""Dispatch loader for Gaussian scene files (parity: gauss_dataloader.py:204-211)."""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

from gs2pc.io.ply import load_ply_gaussians
from gs2pc.io.splat import load_splat_gaussians
from gs2pc.models.gaussians import Gaussians


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


def load_gaussians(
    input_path: str, max_sh_degree: int = 3, return_host: bool = False
):
    """Load a scene; with ``return_host`` also return the HostScene
    mirror (costs host RAM only — the arrays were parsed host-side
    anyway)."""
    ext = os.path.splitext(input_path)[1]
    if ext == ".splat":
        arrays = load_splat_gaussians(input_path)
    elif ext == ".ply":
        arrays = load_ply_gaussians(input_path, max_sh_degree=max_sh_degree)
    else:
        raise AttributeError(f"Unsupported input type {ext}")
    xyz, log_scales, rots, colours, opacities, shs = arrays
    gaussians = Gaussians.create(
        xyz, log_scales, rots, colours, opacities, shs=shs
    )
    if not return_host:
        return gaussians
    host = HostScene(
        xyz=np.ascontiguousarray(xyz, np.float32),
        log_scales=np.ascontiguousarray(log_scales, np.float32),
        rots=np.ascontiguousarray(rots, np.float32),
    )
    return gaussians, host

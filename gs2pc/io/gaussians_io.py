"""Dispatch loader for Gaussian scene files (parity: gauss_dataloader.py:204-211)."""

from __future__ import annotations

import os

from gs2pc.io.ply import load_ply_gaussians
from gs2pc.io.splat import load_splat_gaussians
from gs2pc.models.gaussians import Gaussians


def load_gaussians(input_path: str, max_sh_degree: int = 3) -> Gaussians:
    ext = os.path.splitext(input_path)[1]
    if ext == ".splat":
        arrays = load_splat_gaussians(input_path)
    elif ext == ".ply":
        arrays = load_ply_gaussians(input_path, max_sh_degree=max_sh_degree)
    else:
        raise AttributeError(f"Unsupported input type {ext}")
    xyz, log_scales, rots, colours, opacities, shs = arrays
    return Gaussians.create(xyz, log_scales, rots, colours, opacities, shs=shs)

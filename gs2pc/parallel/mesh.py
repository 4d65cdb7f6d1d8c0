"""Device-mesh helpers.

The reference is single-GPU with hard-coded ``cuda:0`` (SURVEY §2: no
distributed code exists).  gs2pc scales over a 1-D ``jax.sharding.Mesh``:

  * axis "cams":  the camera sweep is data-parallel over cameras
    (accumulators combined with max/min/sum collectives);
  * the sampler's point axis is sharded over the same devices via
    sharding constraints (embarrassingly parallel).

All collectives ride ICI via standard XLA lowering — no custom transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CAM_AXIS = "cams"


def make_mesh(num_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ``num_devices`` (0 = all local devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (CAM_AXIS,))


def camera_sharding(mesh: Mesh) -> NamedSharding:
    """Cameras sharded on their leading axis."""
    return NamedSharding(mesh, P(CAM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def points_sharding(mesh: Mesh) -> NamedSharding:
    """Point clouds sharded on the point axis (sampler output)."""
    return NamedSharding(mesh, P(CAM_AXIS))

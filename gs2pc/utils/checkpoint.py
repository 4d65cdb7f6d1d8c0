"""Checkpoint/resume of render-sweep accumulators.

The reference has no checkpointing (SURVEY §5): its only persisted
artifacts are the final PLY/mesh.  gs2pc persists the post-render
per-Gaussian accumulators (colours, max/total contributions, min surface
distances) so the expensive camera sweep can be reused across sampling
runs — e.g. regenerate a 30M-point cloud from a sweep computed once.
"""

from __future__ import annotations

import numpy as np

from gs2pc.parallel.sweep import SweepAccumulators

_FORMAT_VERSION = 1


def save_accumulators(path: str, acc: SweepAccumulators, num_gaussians: int) -> None:
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        num_gaussians=num_gaussians,
        max_contribution=np.asarray(acc.max_contribution),
        colours=np.asarray(acc.colours),
        total_contribution=np.asarray(acc.total_contribution),
        min_surface_distance=np.asarray(acc.min_surface_distance),
    )


def load_accumulators(path: str, num_gaussians: int) -> SweepAccumulators:
    import jax.numpy as jnp

    with np.load(path) as data:
        if int(data["version"]) != _FORMAT_VERSION:
            raise ValueError(f"Unsupported accumulator checkpoint version in {path}")
        if int(data["num_gaussians"]) != num_gaussians:
            raise ValueError(
                f"Checkpoint {path} was computed for {int(data['num_gaussians'])} "
                f"Gaussians but the scene has {num_gaussians}"
            )
        return SweepAccumulators(
            max_contribution=jnp.asarray(data["max_contribution"]),
            colours=jnp.asarray(data["colours"]),
            total_contribution=jnp.asarray(data["total_contribution"]),
            min_surface_distance=jnp.asarray(data["min_surface_distance"]),
        )

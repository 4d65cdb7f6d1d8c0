"""Checkpoint/resume of render-sweep accumulators.

The reference has no checkpointing (SURVEY §5): its only persisted
artifacts are the final PLY/mesh.  gs2pc persists the post-render
per-Gaussian accumulators (colours, max/total contributions, min surface
distances) so the expensive camera sweep can be reused across sampling
runs — e.g. regenerate a 30M-point cloud from a sweep computed once.

Integrity: alongside the Gaussian count, a content fingerprint of the
scene's xyz array is stored and checked on load — resuming with a
*different* scene that happens to have the same size would otherwise
silently produce garbage colours.
"""

from __future__ import annotations

import hashlib

import numpy as np

from gs2pc.parallel.sweep import SweepAccumulators

_FORMAT_VERSION = 2


def scene_fingerprint(xyz) -> str:
    """Stable content hash of the scene geometry (float32 xyz bytes)."""
    arr = np.ascontiguousarray(np.asarray(xyz, dtype=np.float32))
    return hashlib.sha1(arr.tobytes()).hexdigest()


def save_accumulators(
    path: str,
    acc: SweepAccumulators,
    num_gaussians: int,
    scene_xyz=None,
) -> None:
    extra = {}
    if scene_xyz is not None:
        extra["scene_hash"] = scene_fingerprint(scene_xyz)
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        num_gaussians=num_gaussians,
        max_contribution=np.asarray(acc.max_contribution),
        colours=np.asarray(acc.colours),
        total_contribution=np.asarray(acc.total_contribution),
        min_surface_distance=np.asarray(acc.min_surface_distance),
        **extra,
    )


def load_accumulators(
    path: str, num_gaussians: int, scene_xyz=None
) -> SweepAccumulators:
    import jax.numpy as jnp

    with np.load(path) as data:
        if int(data["version"]) not in (1, _FORMAT_VERSION):
            raise ValueError(f"Unsupported accumulator checkpoint version in {path}")
        if int(data["num_gaussians"]) != num_gaussians:
            raise ValueError(
                f"Checkpoint {path} was computed for {int(data['num_gaussians'])} "
                f"Gaussians but the scene has {num_gaussians}"
            )
        if scene_xyz is not None and "scene_hash" in data:
            want = scene_fingerprint(scene_xyz)
            got = str(data["scene_hash"])
            if got != want:
                raise ValueError(
                    f"Checkpoint {path} was computed for a different scene "
                    f"(geometry fingerprint {got[:12]}... != {want[:12]}...); "
                    "re-run the render sweep for this input"
                )
        return SweepAccumulators(
            max_contribution=jnp.asarray(data["max_contribution"]),
            colours=jnp.asarray(data["colours"]),
            total_contribution=jnp.asarray(data["total_contribution"]),
            min_surface_distance=jnp.asarray(data["min_surface_distance"]),
        )

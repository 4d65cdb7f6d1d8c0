"""Test configuration: force an 8-virtual-device CPU backend.

Standard JAX idiom for exercising pjit/shard_map/collectives on one host
(SURVEY §4): set the flags before jax initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize pre-registers a TPU plugin and pins
# jax_platforms; the config update (not just the env var) wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_synthetic_scene(n=256, seed=0, spread=2.0, scale_lo=-4.0, scale_hi=-1.0):
    """Procedural test scene: n Gaussians in a [-spread, spread] box."""
    from gs2pc.models.gaussians import Gaussians

    r = np.random.default_rng(seed)
    xyz = r.uniform(-spread, spread, (n, 3)).astype(np.float32)
    log_scales = r.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacities = r.uniform(0.3, 1.0, n).astype(np.float32)
    colours = r.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return Gaussians.create(xyz, log_scales, quats, colours, opacities)


@pytest.fixture
def scene():
    return make_synthetic_scene()

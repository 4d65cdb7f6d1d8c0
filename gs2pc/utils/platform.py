"""Honour the JAX_PLATFORMS environment variable.

Some images pin a TPU PJRT plugin via ``jax.config`` from a
``sitecustomize`` module, which silently overrides the standard
``JAX_PLATFORMS`` env var.  Host-only entry points (format converters,
CPU test subprocesses) call :func:`honour_platform_env` before touching
jax so a ``JAX_PLATFORMS=cpu`` request actually lands — otherwise they
block on initialising a TPU backend they never use.
"""

from __future__ import annotations

import os


def honour_platform_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` through ``jax.config``.

    Must run before the first jax computation (backend init is sticky).
    No-op when the variable is unset or jax is unavailable.

    A non-cpu request keeps ``cpu`` registered as a SECONDARY backend:
    ``jax.config`` platform pinning (unlike the plain env var) restricts
    the backend set, and pinning e.g. ``axon`` alone silently removed
    the CPU backend the host-sampling path runs on (``jax.devices("cpu")``
    raised and the pipeline fell back to device sampling + a 10+ s
    position fetch).  The default backend stays the requested one —
    appending cpu changes availability, never selection.
    """
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    try:
        import jax

        names = [p.strip() for p in want.split(",") if p.strip()]
        if "cpu" not in names:
            names.append("cpu")
        jax.config.update("jax_platforms", ",".join(names))
    except Exception:
        pass


# Platform names that denote real TPU hardware.  ``jax.default_backend()``
# is NOT a reliable TPU probe: tunnelled/experimental PJRT plugins register
# under their own platform name (the driver's backend reports 'axon'), and
# gating the Pallas kernel on the literal string "tpu" would silently fall
# back to the XLA blend — or worse, flip a forced kernel run into interpret
# mode — on exactly the hardware the kernel exists for.
_TPU_PLATFORMS = frozenset({"tpu", "axon"})


def is_tpu_backend() -> bool:
    """True when the default JAX device is a TPU chip (any plugin name).

    Checks the device's platform against a known-TPU allowlist and, as a
    forward-compatible fallback, whether its ``device_kind`` self-describes
    as a TPU (e.g. "TPU v5e").  Never raises: returns False when jax is
    unavailable or uninitialisable.
    """
    try:
        import jax

        dev = jax.devices()[0]
    except Exception:
        return False
    plat = (getattr(dev, "platform", "") or "").lower()
    kind = (getattr(dev, "device_kind", "") or "").lower()
    return plat in _TPU_PLATFORMS or "tpu" in kind


def is_tunnelled_attachment() -> bool:
    """True when device IO is proxied over a network tunnel.

    The 'axon' PJRT plugin registers its devices with platform 'tpu'
    (so device.platform cannot distinguish it from a local chip); its
    name appears in the client's platform_version string.  Tunnelled
    links have minute-scale throughput variance, so large-transfer
    policy decisions must not trust a point-in-time bandwidth probe
    there."""
    try:
        import jax

        ver = getattr(
            jax.devices()[0].client, "platform_version", ""
        ) or ""
        return "axon" in ver.lower()
    except Exception:
        return False


_FETCH_BW: float | None = None

# A first probe above this is treated as "looks fast" and CONFIRMED with
# a larger transfer before any code commits to a >100 MB fetch: small
# probes on tunnelled transports can ride a warm burst (measured here:
# 2 MB at ~70 MB/s where a sustained stream ran at ~8 MB/s), and a wrong
# "fast" call costs 10+ s of serial fetch in the output path.
_BW_CONFIRM_MBPS = 40.0


def _one_probe(probe_mb: float) -> float:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(probe_mb * 1e6 / 4)
    # iota, not zeros: all-zero buffers can compress or fast-path on
    # some transports and overstate real bandwidth.
    x = jax.jit(lambda: jnp.arange(n, dtype=jnp.float32) * 1.000001)()
    np.asarray(x.ravel()[0:1])  # exclude compile+execute from timing
    t0 = time.perf_counter()
    np.asarray(x)
    dt = max(time.perf_counter() - t0, 1e-9)
    return (n * 4 / 1e6) / dt


def fetch_bandwidth_mbps(probe_mb: float = 2.0) -> float:
    """Measured device->host bandwidth in MB/s, cached per process.

    One-time cost: transfers ``probe_mb`` of device data once (fractions
    of a second even on a slow tunnelled link; microseconds on a local
    PCIe device), plus a 16 MB confirmation when the small probe looks
    fast — sustained throughput is what the large fetches below actually
    get, and burst-only speed must not trigger them.  The pipeline uses
    this to decide whether to fetch sampled point positions from the
    device or re-derive them host-side (pipeline.py host-sampling path):
    tunnelled links sustain ~8-25 MB/s where local attachments measure
    GB/s.
    """
    global _FETCH_BW
    if _FETCH_BW is not None:
        return _FETCH_BW
    try:
        bw = _one_probe(probe_mb)
    except Exception:
        _FETCH_BW = float("inf")  # probe failure: assume fast, fetch
        return _FETCH_BW
    if bw > _BW_CONFIRM_MBPS:
        # Cheap on a genuinely fast link (16 MB in ~20 ms at GB/s);
        # on a bursty tunnel it costs ~1-2 s ONCE and prevents a
        # 10+ s serial fetch downstream.  min(): the decision
        # thresholds care about the worst sustained rate.  A FAILED
        # confirm keeps the small-probe measurement — a link flaky
        # enough to drop a 16 MB transfer must not be promoted to
        # "assume fast".
        try:
            bw = min(bw, _one_probe(16.0))
        except Exception:
            pass
    _FETCH_BW = bw
    return _FETCH_BW


def fetch_sync(out) -> None:
    """Honest device sync: fetch one element of one output leaf.

    ``block_until_ready()`` can return before execution finishes on
    tunnelled backends; a value fetch is the only reliable barrier.
    One element of one leaf forces the whole executable that produced
    the outputs."""
    import jax
    import numpy as np

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")]
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[0:1]))

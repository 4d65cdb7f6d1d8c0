"""Structured, quiet-gated logging + phase timing.

The reference logs via bare prints gated by --quiet (gauss_to_pc.py:646) and
has no profiling beyond tqdm bars (SURVEY §5).  gs2pc adds named phase
timers (render sweep / sampling / I/O) and optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

_QUIET = False


def set_quiet(quiet: bool) -> None:
    global _QUIET
    _QUIET = quiet


def is_quiet() -> bool:
    """For callers whose MESSAGE PREPARATION is itself costly (e.g. a
    device->host scalar fetch that syncs a dispatch): skip the work, not
    just the print."""
    return _QUIET


def info(msg: str = "") -> None:
    if not _QUIET:
        print(msg, flush=True)


def warn(msg: str) -> None:
    print(f"WARNING: {msg}", flush=True)


# Accumulated wall-clock per phase name since the last reset_phases():
# the bench reads these to attribute end-to-end time without re-plumbing
# timers through the pipeline.
PHASE_SECONDS: dict[str, float] = {}


def reset_phases() -> None:
    PHASE_SECONDS.clear()


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Wall-clock a pipeline phase with a jax.profiler annotation."""
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - start
    PHASE_SECONDS[name] = PHASE_SECONDS.get(name, 0.0) + dt
    if not _QUIET:
        print(f"[gs2pc] {name}: {dt:.2f}s", flush=True)

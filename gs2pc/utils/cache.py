"""Small persistent caches keyed by input content.

The CLI already persists XLA compilations (cli.py); this module holds
the non-compile caches that make repeat conversions of the SAME scene
cheap.  Everything here is an optimisation: corrupt or missing cache
files are ignored, and entries are pure functions of their key, so a
hit is always semantically identical to a miss.

Disable every cache (including the compile cache) with
``GS2PC_CACHE_DIR=""``.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional


def resolve_cache_dir() -> Optional[str]:
    """The gs2pc cache root, or None when caching is disabled."""
    root = os.environ.get(
        "GS2PC_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "gs2pc", "jax_cache",
        ),
    )
    return root or None


def file_fingerprint(path: str) -> str:
    """Cheap content identity for a (possibly multi-hundred-MB) input
    file: size plus sha1 of the first and last MiB.  Hashing the whole
    file would cost ~a second per run for scenes this framework targets;
    a size + head/tail hash distinguishes every realistic edit (3DGS
    exporters rewrite the whole file)."""
    h = hashlib.sha1()
    size = os.path.getsize(path)
    h.update(str(size).encode())
    chunk = 1 << 20
    with open(path, "rb") as f:
        h.update(f.read(chunk))
        if size > 2 * chunk:
            f.seek(size - chunk)
            h.update(f.read(chunk))
    return h.hexdigest()


def _store_path(name: str) -> Optional[str]:
    root = resolve_cache_dir()
    if root is None:
        return None
    return os.path.join(root, f"{name}.json")


def kv_get(store: str, key: str) -> Optional[int]:
    path = _store_path(store)
    if path is None or not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f).get(key)
    except Exception:
        return None  # unreadable cache == no cache


def kv_put(store: str, key: str, value: int, max_entries: int = 256) -> None:
    path = _store_path(store)
    if path is None:
        return
    try:
        data = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    data = json.load(f)
            except Exception:
                data = {}
        data[key] = value
        if len(data) > max_entries:  # drop arbitrary old entries
            for k in list(data)[: len(data) - max_entries]:
                del data[k]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass  # caches never fail the conversion

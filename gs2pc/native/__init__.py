"""Native (C++) host runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 dependency); every entry point has a
pure-numpy fallback in gs2pc.io, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "plyio.cpp")
_SRC_MESH = os.path.join(os.path.dirname(__file__), "mesher.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_gs2pc_native.so")


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, _SRC_MESH, "-o", _SO,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:  # noqa: BLE001 — any failure -> numpy fallback
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_MESH))
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gs2pc_write_ply.restype = ctypes.c_int
        lib.gs2pc_write_ply.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.gs2pc_write_ply_expand.restype = ctypes.c_int
        lib.gs2pc_write_ply_expand.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,  # total points
            ctypes.c_void_p,  # pts f32 (total, 3)
            ctypes.c_void_p,  # counts i64 (P,)
            ctypes.c_int64,  # P
            ctypes.c_void_p,  # cols u8 (P, 3)
            ctypes.c_void_p,  # normals f32 (P, 3) | NULL
            ctypes.c_int64,  # chunk_size
        ]
        lib.gs2pc_deinterleave_f32.restype = ctypes.c_int
        lib.gs2pc_deinterleave_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.gs2pc_marching_tet.restype = ctypes.c_int
        lib.gs2pc_marching_tet.argtypes = [
            ctypes.c_void_p,  # grid f32
            ctypes.c_int64,  # res
            ctypes.c_float,  # iso
            ctypes.POINTER(ctypes.c_void_p),  # ctx out
            ctypes.POINTER(ctypes.c_int64),  # nverts
            ctypes.POINTER(ctypes.c_int64),  # nfaces
        ]
        lib.gs2pc_marching_tet_fetch.restype = ctypes.c_int
        lib.gs2pc_marching_tet_fetch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,  # verts f32 out
            ctypes.c_void_p,  # faces i32 out
        ]
        _LIB = lib
        return _LIB

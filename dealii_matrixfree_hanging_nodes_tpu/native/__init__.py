"""ctypes loader for the native setup core (graceful NumPy fallback).

Builds lazily with make on first import if a compiler is available; the pure
NumPy implementations in mesh.py / dof_handler.py are used when the shared
library cannot be built or loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libmfhn_setup.so")

_lib = None


def _try_build() -> None:
    src = os.path.join(_HERE, "setup_core.cc")
    if not os.path.exists(src):
        return
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return
    try:
        subprocess.run(
            ["make", "-s", "-C", _HERE],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass


_ABI_VERSION = 2  # must match hn_abi_version() in setup_core.cc


def _abi_ok(lib) -> bool:
    """Reject a stale library built before an ABI change (e.g. the int64 ->
    int32 gid-output switch): using the wrong dtype width through ctypes
    silently overruns the output buffers."""
    if not hasattr(lib, "hn_abi_version"):
        return False
    lib.hn_abi_version.restype = ctypes.c_int64
    lib.hn_abi_version.argtypes = []
    return int(lib.hn_abi_version()) == _ABI_VERSION


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        if not _abi_ok(lib):
            # stale binary: force a rebuild and reload once
            try:
                subprocess.run(
                    ["make", "-s", "-B", "-C", _HERE],
                    check=True, capture_output=True, timeout=120,
                )
                lib = ctypes.CDLL(_LIB_PATH)
            except Exception:
                return None
            if not _abi_ok(lib):
                return None
        lib.hn_balance_flags.restype = ctypes.c_int64
        lib.hn_balance_flags.argtypes = [
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.hn_dof_unique.restype = ctypes.c_int64
        lib.hn_dof_unique.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.hn_distribute_dofs.restype = ctypes.c_int64
        lib.hn_distribute_dofs.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def balance_flags(dim: int, level: np.ndarray, coord: np.ndarray):
    """One 2:1-balance sweep; returns bool flags or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(level)
    level = np.ascontiguousarray(level, dtype=np.int64)
    coord = np.ascontiguousarray(coord, dtype=np.int64)
    flags = np.zeros(n, dtype=np.uint8)
    lib.hn_balance_flags(
        dim, n, _ptr(level, ctypes.c_int64), _ptr(coord, ctypes.c_int64),
        _ptr(flags, ctypes.c_uint8)
    )
    return flags.astype(bool)


def distribute_dofs(dim: int, degree: int, level: np.ndarray,
                    coord: np.ndarray):
    """Full entity-key DoF distribution (key build + dedup) in one native
    pass; returns (cell_dofs flat [n_cells*n_loc], n_dofs) or None if
    unavailable/unsupported (caller uses the NumPy path)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "hn_distribute_dofs"):
        return None
    n = len(level)
    level = np.ascontiguousarray(level, dtype=np.int64)
    coord = np.ascontiguousarray(coord, dtype=np.int64)
    n_loc = (degree + 1) ** dim
    gids = np.empty(n * n_loc, dtype=np.int32)
    n_dofs = lib.hn_distribute_dofs(
        dim, degree, n, _ptr(level, ctypes.c_int64),
        _ptr(coord, ctypes.c_int64), _ptr(gids, ctypes.c_int32)
    )
    if n_dofs < 0:
        return None
    return gids, int(n_dofs)


def dof_unique(key1: np.ndarray, key2: np.ndarray):
    """Dense ids for sorted-unique (key1,key2); returns (gids, n_dofs) or None."""
    lib = get_lib()
    if lib is None:
        return None
    key1 = np.ascontiguousarray(key1, dtype=np.int64)
    key2 = np.ascontiguousarray(key2, dtype=np.int64)
    gids = np.empty(len(key1), dtype=np.int32)
    n_dofs = lib.hn_dof_unique(
        len(key1), _ptr(key1, ctypes.c_int64), _ptr(key2, ctypes.c_int64),
        _ptr(gids, ctypes.c_int32)
    )
    return gids, int(n_dofs)

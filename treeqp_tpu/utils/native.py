"""ctypes bindings for the native host runtime (libtreeqp_host.so).

Builds the C++ library on first use if needed (g++; see
interfaces/cpp/Makefile). All entry points have pure-Python fallbacks, so
the package works without a compiler; the native path accelerates topology
construction and array packing for large trees (100k+ nodes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "interfaces", "cpp")
_LIB_PATH = os.path.join(_DIR, "libtreeqp_host.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.tqp_build_topology.restype = ctypes.c_int
        lib.tqp_build_topology.argtypes = [i32p, ctypes.c_int32, i32p, i32p, i32p, i32p]
        lib.tqp_multistage_nk.restype = ctypes.c_int64
        lib.tqp_multistage_nk.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                          ctypes.c_int32, i32p]
        lib.tqp_stage_counts.restype = ctypes.c_int32
        lib.tqp_stage_counts.argtypes = [i32p, ctypes.c_int32, i32p, ctypes.c_int32]
        lib.tqp_pack_colmajor.restype = None
        lib.tqp_pack_colmajor.argtypes = [f64p, i64p, i32p, i32p, ctypes.c_int32,
                                          ctypes.c_int32, ctypes.c_int32, f64p]
        lib.tqp_unpack_colmajor.restype = None
        lib.tqp_unpack_colmajor.argtypes = lib.tqp_pack_colmajor.argtypes
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def build_topology(nk) -> tuple:
    """(parent, stage, sib_index, nkids) from children counts; None if the
    native library is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    nk = np.ascontiguousarray(nk, dtype=np.int32)
    nn = len(nk)
    parent = np.empty(nn, np.int32)
    stage = np.empty(nn, np.int32)
    sib = np.empty(nn, np.int32)
    nkids = np.empty(nn, np.int32)
    rc = lib.tqp_build_topology(_ptr(nk, ctypes.c_int32), nn,
                                _ptr(parent, ctypes.c_int32),
                                _ptr(stage, ctypes.c_int32),
                                _ptr(sib, ctypes.c_int32),
                                _ptr(nkids, ctypes.c_int32))
    if rc != 0:
        raise ValueError("inconsistent nk vector")
    return parent, stage, sib, nkids


def multistage_nk(md: int, Nr: int, Nh: int, nn: int):
    lib = _load()
    if lib is None:
        return None
    nk = np.empty(nn, np.int32)
    n = lib.tqp_multistage_nk(md, Nr, Nh, _ptr(nk, ctypes.c_int32))
    assert n == nn
    return nk


def pack_colmajor(blocks: list, rows, cols, rmax: int, cmax: int):
    """Pack per-node column-major blocks into [nn, rmax, cmax] zero-padded.

    ``blocks`` — list of 1-D f64 arrays (column-major data per node).
    Falls back to None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    nn = len(blocks)
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    sizes = (rows.astype(np.int64) * cols.astype(np.int64))
    offsets = np.zeros(nn, np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    src = (np.concatenate([np.asarray(b, np.float64).reshape(-1) for b in blocks])
           if nn else np.zeros(0))
    src = np.ascontiguousarray(src, np.float64)
    dst = np.empty((nn, rmax, cmax), np.float64)
    lib.tqp_pack_colmajor(_ptr(src, ctypes.c_double), _ptr(offsets, ctypes.c_int64),
                          _ptr(rows, ctypes.c_int32), _ptr(cols, ctypes.c_int32),
                          nn, rmax, cmax, _ptr(dst, ctypes.c_double))
    return dst

"""ctypes binding to the native bucket packer (native/layout_pack.cpp).

Used by core/layout.build_layout for the per-bucket fill loop when the
library builds; falls back to the pure-numpy loop otherwise.  Results are
bit-identical (asserted by tests/test_layout.py::test_native_pack_parity).

Measured reality check (20k 32x32 and 100k 8x8 blocks): construction time
is dominated by shared per-block host bookkeeping (metadata, contiguity,
digest), not the fill loop -- numpy slice-fill is already C-speed -- so the
native packer is at parity today.  It earns its keep as the hook for moving
the *whole* bucket loop native if operator assembly ever becomes a
production bottleneck.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["pack_bucket_native", "available"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "layout_pack.cpp"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_SO = _BUILD_DIR / "libbsplayout.so"

_lock = threading.Lock()
_lib = None
_failed = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _load():
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed:
        raise ImportError("native layout packer unavailable")
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _BUILD_DIR.mkdir(parents=True, exist_ok=True)
                tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     str(_SRC), "-o", str(tmp)],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(str(_SO))
            lib.bsp_pack_bucket.restype = ctypes.c_int64
            lib.bsp_pack_bucket.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_void_p),
                _i32p, _i32p, _i32p, _i32p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                _u8p, _i32p, _i32p,
            ]
            _lib = lib
            return _lib
        except Exception:
            _failed = True
            raise


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def pack_bucket_native(
    blocks, rlists, clists, offs_r, offs_c, mp, kp, dtype,
    row_sentinel, col_sentinel,
):
    """Pack one bucket; returns (values, row_idx, col_idx) numpy arrays."""
    lib = _load()
    nb = len(blocks)
    itemsize = np.dtype(dtype).itemsize

    # zero-copy: pass per-block pointers (conversion is a no-op when the
    # caller's arrays already have the right dtype/contiguity)
    blocks_c = [np.ascontiguousarray(b, dtype=dtype) for b in blocks]
    # build_layout guarantees contiguous int32 index lists
    rlists_c = rlists
    clists_c = clists

    # raw pointer extraction: arr.__array_interface__["data"][0] avoids the
    # expensive per-call .ctypes view construction
    def ptr_array(arrs):
        pa = np.fromiter(
            (a.__array_interface__["data"][0] for a in arrs),
            dtype=np.uintp, count=len(arrs),
        ) if arrs else np.zeros(1, dtype=np.uintp)
        return np.ascontiguousarray(pa)

    blk_ptrs_np = ptr_array(blocks_c)
    row_ptrs_np = ptr_array(rlists_c)
    col_ptrs_np = ptr_array(clists_c)
    as_vpp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_void_p))
    blk_ptrs = as_vpp(blk_ptrs_np)
    row_ptrs = as_vpp(row_ptrs_np)
    col_ptrs = as_vpp(col_ptrs_np)

    ms = np.array([b.shape[0] for b in blocks_c], dtype=np.int32)
    ks = np.array([b.shape[1] for b in blocks_c], dtype=np.int32)
    offs_r = np.ascontiguousarray(np.asarray(offs_r, dtype=np.int32))
    offs_c = np.ascontiguousarray(np.asarray(offs_c, dtype=np.int32))

    values = np.zeros((nb, mp, kp), dtype=dtype)  # lazy zero pages
    row_idx = np.empty((nb, mp), dtype=np.int32)
    col_idx = np.empty((nb, kp), dtype=np.int32)

    rc = lib.bsp_pack_bucket(
        blk_ptrs, row_ptrs, col_ptrs,
        ms.ctypes.data_as(_i32p),
        ks.ctypes.data_as(_i32p),
        offs_r.ctypes.data_as(_i32p),
        offs_c.ctypes.data_as(_i32p),
        nb, mp, kp, itemsize,
        row_sentinel, col_sentinel,
        values.view(np.uint8).ctypes.data_as(_u8p),
        row_idx.ctypes.data_as(_i32p),
        col_idx.ctypes.data_as(_i32p),
    )
    if rc != 0:
        raise RuntimeError(f"bsp_pack_bucket failed with code {rc}")
    return values, row_idx, col_idx

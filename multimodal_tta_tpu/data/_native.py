"""ctypes binding for the native NIfTI decode core (csrc/nifti_native.cpp).

Auto-builds the shared library on first use (g++ is part of the toolchain);
every entry point has a pure-Python fallback in data/nifti.py, so the
framework works without a compiler — the native path is a throughput
optimization for the input pipeline (ctypes calls drop the GIL, so the
threaded HostLoader's decodes run truly in parallel).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "build", "libnifti_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["bash", os.path.join(_CSRC, "build.sh")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.nn_gunzip.restype = ctypes.c_longlong
            lib.nn_gunzip.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_void_p,
                ctypes.c_longlong,
            ]
            lib.nn_cast_reorient_f32.restype = ctypes.c_int
            lib.nn_cast_reorient_f32.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.c_longlong,
                ctypes.c_longlong,
                ctypes.c_longlong,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_void_p,
            ]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# libdeflate (system library, ~2-3x faster inflate than zlib when present)
# ---------------------------------------------------------------------------
_ld_lib = None
_ld_tried = False


def _get_libdeflate() -> Optional[ctypes.CDLL]:
    global _ld_lib, _ld_tried
    if _ld_lib is not None or _ld_tried:
        return _ld_lib
    with _lock:
        if _ld_lib is not None or _ld_tried:
            return _ld_lib
        _ld_tried = True
        for name in ("libdeflate.so.0", "libdeflate.so", "libdeflate.so.1"):
            try:
                lib = ctypes.CDLL(name)
                lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
                lib.libdeflate_gzip_decompress.restype = ctypes.c_int
                lib.libdeflate_gzip_decompress.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_char_p,
                    ctypes.c_size_t,
                    ctypes.c_void_p,
                    ctypes.c_size_t,
                    ctypes.POINTER(ctypes.c_size_t),
                ]
                lib.libdeflate_free_decompressor.argtypes = [ctypes.c_void_p]
                _ld_lib = lib
                break
            except OSError:
                continue
    return _ld_lib


def _gunzip_libdeflate(data: bytes, expected_size: int) -> Optional[bytes]:
    lib = _get_libdeflate()
    if lib is None:
        return None
    dec = lib.libdeflate_alloc_decompressor()
    if not dec:
        return None
    try:
        cap = max(int(expected_size), 1024)
        for _ in range(10):
            out = ctypes.create_string_buffer(cap)
            actual = ctypes.c_size_t(0)
            rc = lib.libdeflate_gzip_decompress(
                dec, data, len(data), out, cap, ctypes.byref(actual)
            )
            if rc == 0:  # LIBDEFLATE_SUCCESS
                return out.raw[: actual.value]
            if rc == 3:  # LIBDEFLATE_INSUFFICIENT_SPACE
                cap *= 4
                continue
            return None
        return None
    finally:
        lib.libdeflate_free_decompressor(dec)


def gunzip(data: bytes, expected_size: int) -> Optional[bytes]:
    """Inflate a gzip byte string; libdeflate when available (fastest), else
    the native zlib core; None when neither is usable (caller falls back to
    the stdlib gzip path). ctypes releases the GIL for the whole inflate."""
    out = _gunzip_libdeflate(data, expected_size)
    if out is not None:
        return out
    lib = get_lib()
    if lib is None:
        return None
    cap = max(int(expected_size), 1024)
    for _ in range(10):  # grow if the caller's size hint was low
        out = ctypes.create_string_buffer(cap)
        n = lib.nn_gunzip(data, len(data), out, cap)
        if n >= 0:
            return out.raw[:n]
        if n == -2:
            cap *= 4
            continue
        return None
    return None


def cast_reorient_f32(
    raw: bytes,
    dtype_code: int,
    shape_xyz,
    flips,
    slope: float,
    inter: float,
) -> Optional[np.ndarray]:
    """raw Fortran (X,Y,Z) voxels -> C-ordered float32 (Z,Y,X) array with
    per-axis flips (input index space) and intensity scaling fused in."""
    lib = get_lib()
    if lib is None:
        return None
    nx, ny, nz = (int(s) for s in shape_xyz)
    out = np.empty((nz, ny, nx), dtype=np.float32)
    rc = lib.nn_cast_reorient_f32(
        raw,
        int(dtype_code),
        nx,
        ny,
        nz,
        int(bool(flips[0])),
        int(bool(flips[1])),
        int(bool(flips[2])),
        float(slope),
        float(inter),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return out

"""Binary float32 blob IO and host transpose.

Mirrors the reference's artifact contract: raw little-endian float32 files
(`get_parameter`, /root/reference/util.c:28-44) — dispatching to the native
C++ library when available, numpy otherwise. Unlike the reference, a missing
or short file raises instead of exit(0)-ing the process.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from winograd_tpu.utils import native


def get_parameter(path: str | os.PathLike, size: int) -> np.ndarray:
    """Load exactly `size` float32 values from a raw blob."""
    path = os.fspath(path)
    lib = native.load()
    if lib is not None:
        out = np.empty(size, dtype=np.float32)
        got = lib.wt_read_f32(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size
        )
        if got < 0:
            raise FileNotFoundError(f"cannot open parameter file: {path}")
        if got != size:
            raise ValueError(f"{path}: expected {size} float32 values, got {got}")
        return out
    with open(path, "rb") as f:
        out = np.fromfile(f, dtype="<f4", count=size)
    if out.size != size:
        raise ValueError(f"{path}: expected {size} float32 values, got {out.size}")
    return out


def save_parameter(path: str | os.PathLike, data: np.ndarray) -> None:
    """Write a float32 array as a raw little-endian blob."""
    path = os.fspath(path)
    flat = np.ascontiguousarray(data, dtype="<f4").ravel()
    lib = native.load()
    if lib is not None:
        put = lib.wt_write_f32(
            path.encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), flat.size
        )
        if put != flat.size:
            raise IOError(f"short write to {path}: {put}/{flat.size}")
        return
    flat.tofile(path)


def transpose(a: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host transpose of a flat (h, w) float32 buffer (util.c:15-26)."""
    a = np.ascontiguousarray(a, dtype=np.float32).ravel()
    assert a.size == h * w, (a.size, h, w)
    lib = native.load()
    if lib is not None:
        out = np.empty(h * w, dtype=np.float32)
        lib.wt_transpose_f32(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h,
            w,
        )
        return out
    return np.ascontiguousarray(a.reshape(h, w).T).ravel()

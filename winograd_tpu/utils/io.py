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


def get_parameters(spec: dict[str, int], threads: int = 8) -> dict[str, np.ndarray]:
    """Load many blobs concurrently: {path: size} -> {path: array}.

    Uses the native thread-pool loader (wt_read_many_f32) when available —
    the reference loads its 10+ per-case blobs serially on the main thread.
    """
    paths = list(spec)
    outs = {p: np.empty(spec[p], dtype=np.float32) for p in paths}
    lib = native.load()
    if lib is not None and paths:
        c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        c_outs = (ctypes.POINTER(ctypes.c_float) * len(paths))(
            *[outs[p].ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for p in paths]
        )
        c_counts = (ctypes.c_longlong * len(paths))(*[spec[p] for p in paths])
        ok = lib.wt_read_many_f32(c_paths, c_outs, c_counts, len(paths), threads)
        if ok != len(paths):
            # Fall through to the serial path for a precise error message.
            for p in paths:
                outs[p] = get_parameter(p, spec[p])
        return outs
    for p in paths:
        outs[p] = get_parameter(p, spec[p])
    return outs


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

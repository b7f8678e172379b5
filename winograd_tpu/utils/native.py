"""ctypes bindings for the native C++ host-runtime library (libwinotpu).

The reference's host layer is C (/root/reference/util.c); this framework's
equivalent is C++ (winograd_tpu/native/winotpu.cpp), compiled on demand with
g++ and loaded via ctypes. Every entry point has a pure-Python fallback, so
the framework works without a toolchain; the native path is used when
available (large-blob IO and the elementwise checker are measurably faster
native).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "winotpu.cpp"))
_LIB = os.path.abspath(os.path.join(_NATIVE_DIR, "libwinotpu.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library handle, building it if needed; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        lib.wt_time_us.restype = ctypes.c_uint64
        lib.wt_read_f32.restype = ctypes.c_longlong
        lib.wt_read_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
        lib.wt_write_f32.restype = ctypes.c_longlong
        lib.wt_write_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
        lib.wt_transpose_f32.restype = None
        lib.wt_transpose_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_longlong,
        ]
        lib.wt_read_many_f32.restype = ctypes.c_longlong
        lib.wt_read_many_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_longlong,
            ctypes.c_longlong,
        ]
        lib.wt_output_checker.restype = ctypes.c_longlong
        lib.wt_output_checker.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,  # len (spatial side)
            ctypes.c_longlong,  # channels
            ctypes.c_longlong,  # shift
            ctypes.c_longlong,  # padded side of A
            ctypes.c_double,    # tolerance
            ctypes.POINTER(ctypes.c_double),  # out: max_error
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None

"""Differential output checker — formalized from the reference's util.c:46-63.

The reference prints `max_error`/`error_cnt` and always exits 0 (its checker
is declared `float` but has no return statement). Here the check RETURNS a
structured result and the benchmark harness raises ParityError on breach
(fixing the no-assert quirk flagged in SURVEY.md section 4).
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

from winograd_tpu.config import PARITY_ATOL
from winograd_tpu.utils import native


class ParityError(AssertionError):
    pass


@dataclasses.dataclass(frozen=True)
class CheckResult:
    max_error: float
    error_count: int
    total: int
    tol: float

    @property
    def error_fraction(self) -> float:
        return self.error_count / max(self.total, 1)

    def ok(self) -> bool:
        """Pass iff max error is FINITE (NaN/Inf anywhere -> fail) and
        max_error <= tol — a strict max-abs-err bar, tighter than the
        reference's <0.1%-violations criterion (report.pdf §5,
        /root/reference/util.c:55)."""
        return bool(np.isfinite(self.max_error)) and self.max_error <= self.tol

    def __str__(self) -> str:
        return (
            f"max_error={self.max_error:.3e} error_cnt={self.error_count}/{self.total} "
            f"(tol={self.tol:g})"
        )


def output_checker(
    a: np.ndarray,
    b: np.ndarray,
    length: int | None = None,
    channels: int | None = None,
    shift: int = 0,
    tol: float = PARITY_ATOL,
) -> CheckResult:
    """Shift-aware elementwise comparison.

    a: (side_a, side_a, C) candidate, valid region at +shift in both spatial
    dims (the reference's padded-16x16-vs-dense-14x14 case, shift=1);
    b: (len, len, C) oracle. With shift=0 and matching shapes this is a plain
    elementwise comparison. Arbitrary-rank inputs are compared flat.
    """
    a = np.ascontiguousarray(a, dtype=np.float32)
    b = np.ascontiguousarray(b, dtype=np.float32)

    if length is None or channels is None:
        # Plain dense comparison of identically-shaped arrays. NaN diffs
        # must COUNT as violations (NaN > tol is False), hence ~(diff <= tol).
        assert a.shape == b.shape, (a.shape, b.shape)
        diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
        max_err = float(np.max(diff)) if diff.size else 0.0
        return CheckResult(max_err, int((~(diff <= tol)).sum()), b.size, tol)

    side_a = a.shape[0]
    lib = native.load()
    if lib is not None and a.ndim == 3 and b.ndim == 3:
        max_err = ctypes.c_double(0.0)
        count = lib.wt_output_checker(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            length,
            channels,
            shift,
            side_a,
            tol,
            ctypes.byref(max_err),
        )
        return CheckResult(float(max_err.value), int(count), length * length * channels, tol)

    valid = a[shift : shift + length, shift : shift + length, :channels]
    diff = np.abs(valid.astype(np.float64) - b.astype(np.float64))
    max_err = float(np.max(diff)) if diff.size else 0.0
    return CheckResult(max_err, int((~(diff <= tol)).sum()), diff.size, tol)

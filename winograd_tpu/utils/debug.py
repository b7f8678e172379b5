"""Debug / validation subsystem.

The reference's error handling is a `cudaCheckError()` macro commented out
at most call sites plus printf-on-bad-status (SURVEY.md §5). The TPU-native
equivalents, actually wired in:

* nan_checks()     — context manager enabling jax_debug_nans (XLA raises on
                     the op that produced a NaN — the device-side sanitizer).
* interpret_mode() — force ALL Pallas kernels through the interpreter
                     (pltpu.force_tpu_interpret_mode), the kernel-level
                     debugger: runs on any backend, supports pl.debug_print.
* check_finite()   — host-side assertion on a pytree of arrays, for use at
                     subsystem boundaries (checkpoint load, datagen output).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax

import numpy as np
from jax.experimental.pallas import tpu as pltpu


@contextlib.contextmanager
def nan_checks():
    """Enable XLA NaN checking for the scope (slow; debug builds only)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def interpret_mode():
    """Run all Pallas kernels in interpreter mode for the scope."""
    with pltpu.force_tpu_interpret_mode():
        yield


def check_finite(tree: Any, name: str = "tree") -> None:
    """Raise ValueError naming the offending leaf if any value is non-finite."""
    leaves, _ = jax.tree.flatten_with_path(tree) if hasattr(jax.tree, "flatten_with_path") else (None, None)
    if leaves is None:  # older jax fallback
        for i, leaf in enumerate(jax.tree.leaves(tree)):
            if not np.isfinite(np.asarray(leaf)).all():
                raise ValueError(f"{name}: non-finite values in leaf {i}")
        return
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise ValueError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite value(s), "
                f"shape {arr.shape}"
            )

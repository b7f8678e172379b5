"""Debug subsystem: interpret mode, finite checks, nan checking."""

import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.utils import debug


def test_check_finite_passes_and_names_offender():
    debug.check_finite({"a": jnp.ones(3), "b": np.zeros(2)}, "params")
    with pytest.raises(ValueError, match="params.*non-finite"):
        debug.check_finite({"a": jnp.ones(3), "bad": jnp.array([1.0, jnp.nan])}, "params")


def test_interpret_mode_runs_kernels():
    from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas

    rng = np.random.default_rng(0)
    x = (rng.random((4, 4, 128), dtype=np.float32) - 0.5)
    w = (rng.random((128, 128), dtype=np.float32) - 0.5)
    s = np.ones(128, np.float32)
    b = np.zeros(128, np.float32)
    with debug.interpret_mode():
        out = np.asarray(conv1x1_bn_pallas(x, w, s, b, relu=True, interpret=True))
    assert np.isfinite(out).all()


def test_nan_checks_context_restores_flag():
    import jax

    before = jax.config.jax_debug_nans
    with debug.nan_checks():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before

"""Host utility layer: IO, transpose, timing, checker (native + fallback)."""

import numpy as np
import pytest

from winograd_tpu.utils import (
    get_parameter,
    get_time_microseconds64,
    output_checker,
    save_parameter,
    transpose,
)
from winograd_tpu.utils import native
from winograd_tpu.utils.checker import CheckResult


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal(1000).astype(np.float32)
    path = tmp_path / "blob.bin"
    save_parameter(path, data)
    back = get_parameter(path, 1000)
    np.testing.assert_array_equal(back, data)


def test_get_parameter_missing_file_raises(tmp_path):
    with pytest.raises((FileNotFoundError, ValueError)):
        get_parameter(tmp_path / "nope.bin", 10)


def test_get_parameter_short_file_raises(tmp_path):
    path = tmp_path / "short.bin"
    save_parameter(path, np.zeros(5, np.float32))
    with pytest.raises(ValueError):
        get_parameter(path, 10)


def test_transpose():
    a = np.arange(12, dtype=np.float32)
    out = transpose(a, 3, 4)
    np.testing.assert_array_equal(out.reshape(4, 3), a.reshape(3, 4).T)


def test_timer_monotonic_scale():
    t0 = get_time_microseconds64()
    t1 = get_time_microseconds64()
    assert t1 >= t0
    assert t0 > 1e15  # microseconds since epoch in 2026


def test_checker_dense():
    a = np.zeros((4, 4, 8), np.float32)
    b = a.copy()
    b[1, 2, 3] = 2e-4
    res = output_checker(a, b, tol=1e-4)
    assert isinstance(res, CheckResult)
    assert res.error_count == 1
    assert res.max_error == pytest.approx(2e-4)
    # ok() uses fraction tol 1e-3; 1/128 ≈ 0.8% breaches it.
    assert res.error_fraction > 1e-3
    assert not res.ok()


def test_checker_fails_on_nan_and_inf():
    """A NaN/Inf anywhere in the candidate must fail parity — `diff > tol`
    is False for NaN, so the count must use the negated comparison."""
    b = np.zeros((4, 4, 8), np.float32)
    for bad in (np.nan, np.inf):
        a = b.copy()
        a[2, 2, 2] = bad
        res = output_checker(a, b, tol=1e-4)
        assert res.error_count >= 1
        assert not res.ok()


def test_checker_fails_on_catastrophic_outlier():
    """ok() must enforce a hard max-error cap, not just the <0.1% violation
    fraction — a few arbitrarily-wrong elements are still a failure."""
    b = np.zeros((14, 14, 128), np.float32)
    a = b.copy()
    a[0, 0, :5] = 1e6  # 5/25088 elements: under the 0.1% fraction
    res = output_checker(a, b, tol=1e-4)
    assert res.error_fraction < 1e-3
    assert not res.ok()


def test_native_checker_nan_parity(tmp_path):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    b = np.zeros((14, 14, 8), np.float32)
    a = np.zeros((16, 16, 8), np.float32)
    a[3, 3, 3] = np.nan
    res = output_checker(a, b, length=14, channels=8, shift=1, tol=1e-4)
    assert res.error_count >= 1
    assert not res.ok()


def test_checker_shift_aware():
    """The reference's padded-16x16-vs-dense-14x14 comparison (util.c:52-54)."""
    rng = np.random.default_rng(1)
    b = rng.standard_normal((14, 14, 4)).astype(np.float32)
    a = np.zeros((16, 16, 4), np.float32)
    a[1:15, 1:15, :] = b
    res = output_checker(a, b, length=14, channels=4, shift=1, tol=1e-5)
    assert res.error_count == 0
    assert res.max_error == 0.0


def test_parallel_loader_roundtrip(tmp_path):
    from winograd_tpu.utils.io import get_parameters

    rng = np.random.default_rng(4)
    spec, want = {}, {}
    for i in range(12):
        data = rng.standard_normal(100 + i).astype(np.float32)
        path = str(tmp_path / f"blob{i}.bin")
        save_parameter(path, data)
        spec[path] = data.size
        want[path] = data
    got = get_parameters(spec, threads=4)
    for path in spec:
        np.testing.assert_array_equal(got[path], want[path])


def test_load_case_roundtrip(tmp_path):
    from winograd_tpu.datagen.generate import generate_all, load_case, make_case

    outdir = str(tmp_path / "data")
    generate_all(outdir, seed=0)
    for mode in (0, 3, 6):
        mem = make_case(mode, seed=mode)
        disk = load_case(mode, outdir)
        np.testing.assert_allclose(disk["x"], mem["x"], atol=0)
        np.testing.assert_allclose(disk["golden"], mem["golden"], atol=0)


def test_native_python_parity(tmp_path):
    """If the native lib built, it must agree with the numpy fallback."""
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(2)
    a = rng.standard_normal((16, 16, 8)).astype(np.float32)
    b = rng.standard_normal((14, 14, 8)).astype(np.float32)
    res_native = output_checker(a, b, length=14, channels=8, shift=1, tol=1e-2)
    valid = a[1:15, 1:15, :]
    diff = np.abs(valid.astype(np.float64) - b.astype(np.float64))
    assert res_native.error_count == int((diff > 1e-2).sum())
    assert res_native.max_error == pytest.approx(float(diff.max()), rel=1e-6)

"""Winograd transform algebra — the foundation everything else trusts."""

import numpy as np

from winograd_tpu.kernels import transforms


def _corr2d_valid(d, g):
    out = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            out[i, j] = (d[i : i + 3, j : j + 3] * g).sum()
    return out


def test_f4x3_identity():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((6, 6))
    g = rng.standard_normal((3, 3))
    u = transforms.G @ g @ transforms.G.T
    v = transforms.BT @ d @ transforms.BT.T
    y = transforms.AT @ (u * v) @ transforms.AT.T
    np.testing.assert_allclose(y, _corr2d_valid(d, g), atol=1e-12)


def test_kron_forms_match_2d_transforms():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((6, 6))
    m = rng.standard_normal((6, 6))
    np.testing.assert_allclose(
        transforms.BT_KRON @ d.reshape(36), (transforms.BT @ d @ transforms.BT.T).reshape(36),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        transforms.AT_KRON @ m.reshape(36), (transforms.AT @ m @ transforms.AT.T).reshape(16),
        atol=1e-12,
    )


def test_transform_filter_layout():
    """(36, Cin, Cout) position-major, matching the reference's disk layout
    (data_generator.py:72-75: element position major, then cin*Cout + cout)."""
    rng = np.random.default_rng(2)
    cout, cin = 4, 3
    w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    u = transforms.transform_filter(w, dtype=np.float64)
    assert u.shape == (36, cin, cout)
    o, i = 1, 2
    expected = (transforms.G @ w[o, i].astype(np.float64) @ transforms.G.T).reshape(36)
    np.testing.assert_allclose(u[:, i, o], expected, atol=1e-12)


def test_fold_batchnorm():
    rng = np.random.default_rng(3)
    c = 16
    gamma, beta, mean = (rng.standard_normal(c).astype(np.float32) for _ in range(3))
    var = (rng.random(c) * 3 + 5).astype(np.float32)
    scale, bias = transforms.fold_batchnorm(gamma, beta, mean, var, eps=1e-5)
    x = rng.standard_normal((7, c)).astype(np.float32)
    bn = gamma * (x - mean) / np.sqrt(var + 1e-5) + beta
    np.testing.assert_allclose(x * scale + bias, bn, atol=1e-5)

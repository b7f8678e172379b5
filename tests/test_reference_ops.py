"""Golden numpy models vs the jnp ops (two independent oracles must agree)."""

import numpy as np

from winograd_tpu.ops import jnp_ops, reference


def test_conv3x3_jnp_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((14, 14, 8)).astype(np.float32)
    w = rng.standard_normal((4, 8, 3, 3)).astype(np.float32)
    s = rng.standard_normal(4).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=True)
    out = np.asarray(jnp_ops.conv3x3_bn_relu(x, w, s, b, relu=True))
    np.testing.assert_allclose(out, gold, atol=1e-4)


def test_conv1x1_jnp_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((14, 14, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    s = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    for relu in (True, False):
        gold = reference.conv1x1_bn(x, w, s, b, relu=relu)
        out = np.asarray(jnp_ops.conv1x1_bn(x, w, s, b, relu=relu))
        np.testing.assert_allclose(out, gold, atol=1e-4)


def test_relu_asymmetry_matters():
    """Expand layers have no ReLU (reference Kernel128_one.cu:271-272);
    guard that the flag actually changes the result."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 4, 8)).astype(np.float32)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    s = np.ones(8, np.float32)
    b = np.zeros(8, np.float32)
    with_relu = reference.conv1x1_bn(x, w, s, b, relu=True)
    without = reference.conv1x1_bn(x, w, s, b, relu=False)
    assert (without < 0).any()
    assert not (with_relu < 0).any()


def test_bottleneck_block_jnp_matches_numpy():
    rng = np.random.default_rng(3)
    cio, cmid = 16, 8
    x = rng.standard_normal((14, 14, cio)).astype(np.float32)
    wr = rng.standard_normal((cio, cmid)).astype(np.float32)
    wm = rng.standard_normal((cmid, cmid, 3, 3)).astype(np.float32)
    we = rng.standard_normal((cmid, cio)).astype(np.float32)
    ones = lambda c: np.ones(c, np.float32)
    zeros = lambda c: np.zeros(c, np.float32)
    gold = reference.bottleneck_block(
        x, wr, ones(cmid), zeros(cmid), wm, ones(cmid), zeros(cmid), we, ones(cio), zeros(cio)
    )
    params = dict(
        w_reduce=wr, s_reduce=ones(cmid), b_reduce=zeros(cmid),
        w_mid=wm, s_mid=ones(cmid), b_mid=zeros(cmid),
        w_expand=we, s_expand=ones(cio), b_expand=zeros(cio),
    )
    out = np.asarray(jnp_ops.bottleneck_block(x, params))
    np.testing.assert_allclose(out, gold, atol=1e-3)

"""Fused direct (im2col GEMM) 3x3 kernel vs the numpy golden model."""

import numpy as np
import pytest

from winograd_tpu.config import CASES, PARITY_ATOL
from winograd_tpu.datagen.generate import make_winograd_case
from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter
from winograd_tpu.ops import reference


@pytest.mark.parametrize("mode", [0, 1])
def test_reference_cases(mode):
    cfg = CASES[mode]
    case = make_winograd_case(cfg, seed=mode)
    out = np.asarray(
        conv3x3_bn_direct_pallas(case["x"], case["w9"], case["scale"], case["bias"], relu=cfg.relu)
    )
    err = np.abs(out - case["golden"]).max()
    assert err < PARITY_ATOL, f"mode {mode}: max err {err}"


def test_direct_filter_layout():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 8, 3, 3)).astype(np.float32)
    w9 = np.asarray(direct_filter(w))
    assert w9.shape == (72, 4)
    r, s, c, o = 1, 2, 3, 2
    assert w9[(3 * r + s) * 8 + c, o] == w[o, c, r, s]


def test_batched_and_no_relu():
    rng = np.random.default_rng(1)
    x = (rng.random((2, 14, 14, 128), dtype=np.float32) - 0.5)
    w = (rng.random((128, 128, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=False)
    out = np.asarray(conv3x3_bn_direct_pallas(x, np.asarray(direct_filter(w)), s, b, relu=False))
    assert out.shape == (2, 14, 14, 128)
    assert (out < 0).any()
    np.testing.assert_allclose(out, gold, atol=PARITY_ATOL)


def test_cout_tiling():
    rng = np.random.default_rng(2)
    x = (rng.random((14, 14, 128), dtype=np.float32) - 0.5)
    w = (rng.random((256, 128, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(256, dtype=np.float32) - 0.5)
    b = (rng.random(256, dtype=np.float32) - 0.5)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=True)
    out = np.asarray(
        conv3x3_bn_direct_pallas(x, np.asarray(direct_filter(w)), s, b, relu=True, tile_co=128)
    )
    np.testing.assert_allclose(out, gold, atol=PARITY_ATOL)

"""Fused pointwise Pallas kernel vs the numpy golden model.

Covers the reference's four 1x1 cases (modes 2-5) including the ReLU
asymmetry, plus batching and tiling paths the reference doesn't have.
"""

import numpy as np
import pytest

from winograd_tpu.config import CASES, PARITY_ATOL
from winograd_tpu.datagen.generate import make_pointwise_case
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.ops import reference


@pytest.mark.parametrize("mode", [2, 3, 4, 5])
def test_reference_cases(mode):
    cfg = CASES[mode]
    case = make_pointwise_case(cfg, seed=mode)
    out = np.asarray(
        conv1x1_bn_pallas(case["x"], case["w"], case["scale"], case["bias"], relu=cfg.relu)
    )
    err = np.abs(out - case["golden"]).max()
    assert err < PARITY_ATOL, f"mode {mode}: max err {err}"


def test_batched_input():
    rng = np.random.default_rng(0)
    x = (rng.random((3, 14, 14, 256), dtype=np.float32) - 0.5)
    w = (rng.random((256, 128), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(x, w, s, b, relu=True)
    out = np.asarray(conv1x1_bn_pallas(x, w, s, b, relu=True))
    assert out.shape == (3, 14, 14, 128)
    assert np.abs(out - gold).max() < PARITY_ATOL


def test_k_and_n_tiling():
    """Force multi-step contraction and output tiling grids."""
    rng = np.random.default_rng(1)
    x = (rng.random((14, 14, 512), dtype=np.float32) - 0.5)
    w = (rng.random((512, 512), dtype=np.float32) - 0.5)
    s = (rng.random(512, dtype=np.float32) - 0.5)
    b = (rng.random(512, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(x, w, s, b, relu=False)
    out = np.asarray(
        conv1x1_bn_pallas(x, w, s, b, relu=False, tile_n=128, tile_k=128, tile_p=128)
    )
    assert np.abs(out - gold).max() < PARITY_ATOL


def test_non_power_of_two_channels():
    """Auto tile selection must pick DIVIDING tiles (cout=768 etc.)."""
    rng = np.random.default_rng(5)
    x = (rng.random((7, 7, 384), dtype=np.float32) - 0.5)
    w = (rng.random((384, 768), dtype=np.float32) - 0.5)
    s = (rng.random(768, dtype=np.float32) - 0.5)
    b = (rng.random(768, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(x, w, s, b, relu=True)
    out = np.asarray(conv1x1_bn_pallas(x, w, s, b, relu=True))
    assert np.abs(out - gold).max() < PARITY_ATOL


def test_auto_tiles_are_mosaic_lowerable():
    """Auto-chosen MINOR-dim tiles must be 128-lane multiples or the full
    dim — Mosaic rejects anything else at lowering time (the CPU interpret
    suite can't catch it, so pin the chooser directly). Regression: the
    basic family's 9*Cin im2col widths (576/1152/2304) crashed the remote
    compiler when largest_divisor_leq picked 288/576-style tiles."""
    from winograd_tpu.kernels.pointwise import mxu_lane_divisor

    for n in (64, 128, 256, 512, 576, 768, 1000, 1152, 2048, 2304, 4608):
        for cap in (128, 256, 512):
            d = mxu_lane_divisor(n, cap)
            assert n % d == 0, (n, cap, d)
            assert d % 128 == 0 or d == n, (n, cap, d)
            if n <= cap:
                assert d == n
    assert mxu_lane_divisor(1152, 512) == 384
    assert mxu_lane_divisor(4608, 512) == 512
    assert mxu_lane_divisor(576, 512) == 576  # no lane-multiple divisor


def test_im2col_width_576_contraction():
    """The ResNet-18 entry block's (hw, 9*64) im2col GEMM — K=576 has no
    lane-multiple divisor, so the auto chooser must keep K untiled."""
    rng = np.random.default_rng(7)
    cols = (rng.random((784, 576), dtype=np.float32) - 0.5)
    w = (rng.random((576, 128), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(cols, w, s, b, relu=True)
    out = np.asarray(conv1x1_bn_pallas(cols, w, s, b, relu=True))
    assert np.abs(out - gold).max() < PARITY_ATOL


def test_rejects_channel_mismatch():
    x = np.zeros((2, 2, 64), np.float32)
    w = np.zeros((128, 128), np.float32)
    with pytest.raises(AssertionError):
        conv1x1_bn_pallas(x, w, np.zeros(128, np.float32), np.zeros(128, np.float32), relu=True)

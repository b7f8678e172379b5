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


def test_rejects_channel_mismatch():
    x = np.zeros((2, 2, 64), np.float32)
    w = np.zeros((128, 128), np.float32)
    with pytest.raises(AssertionError):
        conv1x1_bn_pallas(x, w, np.zeros(128, np.float32), np.zeros(128, np.float32), relu=True)

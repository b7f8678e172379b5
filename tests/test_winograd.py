"""Fused single-kernel Winograd Pallas pipeline vs the numpy golden model.

Covers the reference's two 3x3 cases (modes 0/1), the output-channel-slice
grid path, batching, and the no-ReLU variant.
"""

import numpy as np
import pytest

from winograd_tpu.config import CASES, PARITY_ATOL
from winograd_tpu.datagen.generate import make_winograd_case
from winograd_tpu.kernels import transforms
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.ops import reference


@pytest.mark.parametrize("mode", [0, 1])
def test_reference_cases(mode):
    cfg = CASES[mode]
    case = make_winograd_case(cfg, seed=mode)
    out = np.asarray(
        conv3x3_bn_winograd_pallas(case["x"], case["u"], case["scale"], case["bias"], relu=cfg.relu)
    )
    assert out.shape == case["golden"].shape
    err = np.abs(out - case["golden"]).max()
    assert err < PARITY_ATOL, f"mode {mode}: max err {err}"


def test_cout_slicing_grid():
    """tile_co < Cout exercises the j grid dimension + phase-1 reuse."""
    rng = np.random.default_rng(0)
    x = (rng.random((14, 14, 128), dtype=np.float32) - 0.5)
    w = (rng.random((256, 128, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(256, dtype=np.float32) - 0.5)
    b = (rng.random(256, dtype=np.float32) - 0.5)
    u = transforms.transform_filter(w)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=True)
    out = np.asarray(conv3x3_bn_winograd_pallas(x, u, s, b, relu=True, tile_co=128))
    np.testing.assert_allclose(out, gold, atol=PARITY_ATOL)


def test_batch_tiling_nb():
    """nb > 1 packs several images' tiles into one GEMM row block; results
    must be identical to the per-image path."""
    rng = np.random.default_rng(7)
    x = (rng.random((4, 14, 14, 128), dtype=np.float32) - 0.5)
    w = (rng.random((128, 128, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    u = transforms.transform_filter(w)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=True)
    out1 = np.asarray(conv3x3_bn_winograd_pallas(x, u, s, b, relu=True, nb=1))
    out2 = np.asarray(conv3x3_bn_winograd_pallas(x, u, s, b, relu=True, nb=2))
    out4 = np.asarray(conv3x3_bn_winograd_pallas(x, u, s, b, relu=True, nb=4))
    np.testing.assert_allclose(out1, gold, atol=PARITY_ATOL)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(out2, out4)


def test_batched_and_no_relu():
    rng = np.random.default_rng(1)
    x = (rng.random((2, 14, 14, 128), dtype=np.float32) - 0.5)
    w = (rng.random((128, 128, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    u = transforms.transform_filter(w)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=False)
    out = np.asarray(conv3x3_bn_winograd_pallas(x, u, s, b, relu=False))
    assert out.shape == (2, 14, 14, 128)
    assert (np.asarray(out) < 0).any(), "no-ReLU output should have negatives"
    np.testing.assert_allclose(out, gold, atol=PARITY_ATOL)


@pytest.mark.parametrize("shape", [(1, 56, 56), (1, 8, 8), (2, 14, 16)])
def test_lane_packed_64ch(shape):
    """The lane-packed tile-pair path for 64-channel F(2,3) convs
    (ResNet-18/34 conv2_x): two tile columns share one 128-lane tile with a
    block-diag packed filter. Parity vs the golden AND vs the unpacked
    kernel, plus the no-ReLU variant."""
    n, h, w = shape
    rng = np.random.default_rng(h + w + n)
    x = (rng.random((n, h, w, 64), dtype=np.float32) - 0.5)
    wt = (rng.random((64, 64, 3, 3), dtype=np.float32) - 0.5) * 0.2
    s = (rng.random(64, dtype=np.float32) - 0.5)
    b = (rng.random(64, dtype=np.float32) - 0.5)
    u = transforms.transform_filter(wt, m=2)
    for relu in (True, False):
        gold = reference.conv3x3_bn_relu(x, wt, s, b, relu=relu)
        outp = np.asarray(
            conv3x3_bn_winograd_pallas(x, u, s, b, relu=relu, packed=True)
        )
        outu = np.asarray(
            conv3x3_bn_winograd_pallas(x, u, s, b, relu=relu, packed=False)
        )
        np.testing.assert_allclose(outp, gold, atol=PARITY_ATOL)
        np.testing.assert_allclose(outp, outu, atol=PARITY_ATOL)


def test_lane_packed_64ch_bf16w():
    """bf16 weight-storage tier through the packed path stays inside the
    tier bound (offline weight rounding only)."""
    rng = np.random.default_rng(3)
    x = (rng.random((1, 56, 56, 64), dtype=np.float32) - 0.5)
    wt = (rng.random((64, 64, 3, 3), dtype=np.float32) - 0.5) * 0.2
    s = (rng.random(64, dtype=np.float32) - 0.5)
    b = (rng.random(64, dtype=np.float32) - 0.5)
    u = transforms.transform_filter(wt, m=2)
    gold = reference.conv3x3_bn_relu(x, wt, s, b, relu=True)
    out = np.asarray(
        conv3x3_bn_winograd_pallas(
            x, u, s, b, relu=True, packed=True, precision="bf16w"
        )
    )
    rel = np.abs(out - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 5e-3, rel

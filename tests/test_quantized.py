"""Int8 quantized pointwise kernel: quantization-tier accuracy bounds."""

import numpy as np
import pytest

from winograd_tpu.kernels.quantized import conv1x1_bn_int8_pallas, quantize_weights
from winograd_tpu.ops import reference


def test_weight_quantization_roundtrip():
    rng = np.random.default_rng(0)
    w = (rng.random((64, 32), dtype=np.float32) - 0.5)
    w_q, s_w = quantize_weights(w)
    assert w_q.dtype == np.int8 and s_w.shape == (32,)
    # Per-column max maps to ±127.
    assert np.abs(w_q).max() == 127
    np.testing.assert_allclose(w_q * s_w, w, atol=np.abs(w).max() / 127 + 1e-7)


def test_int8_block_megakernel():
    from winograd_tpu.config import CASES
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.kernels.quantized import (
        bottleneck_block_int8_pallas,
        quantize_block_params,
    )

    case = make_block_case(CASES[6], seed=6)
    params = block_params_list(CASES[6], case)[0]
    qparams = quantize_block_params(params)
    out = np.asarray(bottleneck_block_int8_pallas(case["x"], qparams))
    gold = case["golden"]
    rel = np.abs(out - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 5e-2, f"int8 block relative error {rel}"
    corr = np.corrcoef(out.ravel(), gold.ravel())[0, 1]
    assert corr > 0.995


def test_int8_stage_streaming_kernel():
    """Int8 weight-streaming stage kernel (conv5_x-class serving tier):
    matches the f64 golden chain at the 8-bit tier, for a multi-block
    stage AND a single streamed block."""
    from winograd_tpu.config import BlockConfig
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.kernels.quantized import (
        quantize_stage_params,
        resnet_stage_int8_pallas,
    )

    cfg = BlockConfig("t", c_io=128, c_mid=32, hw=7, blocks=2)
    case = make_block_case(cfg, seed=9)
    params_list = block_params_list(cfg, case)
    qstacked = quantize_stage_params(params_list)
    out = np.asarray(resnet_stage_int8_pallas(case["x"], qstacked))
    gold = case["golden"]
    rel = np.abs(out - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 5e-2, f"int8 stage relative error {rel}"
    assert np.corrcoef(out.ravel(), gold.ravel())[0, 1] > 0.995

    cfg1 = BlockConfig("t1", c_io=128, c_mid=32, hw=7, blocks=1)
    case1 = make_block_case(cfg1, seed=10)
    q1 = quantize_stage_params(block_params_list(cfg1, case1))
    out1 = np.asarray(resnet_stage_int8_pallas(case1["x"], q1))
    rel1 = np.abs(out1 - case1["golden"]).max() / max(np.abs(case1["golden"]).max(), 1.0)
    assert rel1 < 5e-2, f"single-block int8 stream relative error {rel1}"


@pytest.mark.parametrize("relu", [True, False])
def test_int8_conv_matches_f32_at_8bit_tier(relu):
    rng = np.random.default_rng(1)
    x = (rng.random((14, 14, 256), dtype=np.float32) - 0.5)
    w = (rng.random((256, 128), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(x, w, s, b, relu=relu)
    w_q, s_w = quantize_weights(w)
    out = np.asarray(conv1x1_bn_int8_pallas(x, w_q, s_w, s, b, relu=relu))
    # 8-bit tier: relative error vs the output scale, not the f32 bar.
    denom = max(np.abs(gold).max(), 1.0)
    rel = np.abs(out - gold).max() / denom
    assert rel < 2e-2, f"int8 relative error {rel}"
    # And it must be far better than pure noise: correlation ~ 1.
    corr = np.corrcoef(out.ravel(), gold.ravel())[0, 1]
    assert corr > 0.999

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


def test_int8_transition_and_backbone():
    """Int8 transition kernel + the fully-int8 multi-stage backbone hold
    the 8-bit tier bound against the float64 golden chain."""
    import jax.numpy as jnp

    from winograd_tpu.config import CASES, TransitionConfig
    from winograd_tpu.datagen.generate import (
        backbone_stages,
        make_case,
        make_transition_case,
        transition_params,
    )
    from winograd_tpu.kernels.quantized import (
        quantize_transition_params,
        transition_block_int8_pallas,
    )
    from winograd_tpu.models.downsample import quantize_backbone, resnet50_stages_int8

    tcfg = TransitionConfig("t", 128, 64, 256, hw=14)
    tcase = make_transition_case(tcfg, seed=5)
    qp = quantize_transition_params(transition_params(tcase))
    out = np.asarray(transition_block_int8_pallas(jnp.asarray(tcase["x"]), qp))
    gold = tcase["golden"]
    rel = np.abs(out - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 5e-2, f"int8 transition relative error {rel}"
    assert np.corrcoef(out.ravel(), gold.ravel())[0, 1] > 0.99

    case = make_case(13, seed=13)
    qstages = quantize_backbone(backbone_stages(CASES[13], case))
    outb = np.asarray(resnet50_stages_int8(jnp.asarray(case["x"]), qstages))
    goldb = case["golden"]
    relb = np.abs(outb - goldb).max() / max(np.abs(goldb).max(), 1.0)
    # Quantization error compounds through 13 blocks; the backbone tier
    # bound is looser than the single-block 5e-2.
    assert relb < 2e-1, f"int8 backbone relative error {relb}"
    assert np.corrcoef(outb.ravel(), goldb.ravel())[0, 1] > 0.98


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


def test_int8_stage_and_transition_weight_resident_batched():
    """Batched int8 stage/transition take the weight-resident layouts
    (block-outer / tile-outer grids — int8 weights fetched once per batch);
    must match the per-image kernels exactly."""
    from winograd_tpu.config import CASES, BlockConfig
    from winograd_tpu.datagen.generate import (
        block_params_list,
        make_block_case,
        make_transition_case,
        transition_params,
    )
    from winograd_tpu.kernels.quantized import (
        quantize_stage_params,
        quantize_transition_params,
        resnet_stage_int8_pallas,
        transition_block_int8_pallas,
    )

    cfg = BlockConfig("t", c_io=256, c_mid=64, hw=14, blocks=3, batch=4)
    case = make_block_case(cfg, seed=71)
    qs = quantize_stage_params(block_params_list(cfg, case))
    x = case["x"]
    out_b = np.asarray(resnet_stage_int8_pallas(x, qs, resident=True))
    per = np.stack(
        [np.asarray(resnet_stage_int8_pallas(x[i], qs)) for i in range(4)]
    )
    assert np.abs(out_b - per).max() < 1e-5
    rel = np.abs(out_b - case["golden"]).max() / np.abs(case["golden"]).max()
    assert rel < 5e-2, rel

    tcase = make_transition_case(CASES[11], seed=72)
    qp = quantize_transition_params(transition_params(tcase))
    x1 = tcase["x"]
    xb = np.stack([x1, 0.5 * x1, -x1])
    tb = np.asarray(
        transition_block_int8_pallas(xb, qp, tile_co=128, resident=True)
    )
    tper = np.stack(
        [np.asarray(transition_block_int8_pallas(xb[i], qp)) for i in range(3)]
    )
    assert np.abs(tb - tper).max() < 1e-5


def test_int8_stage_winograd2_mid_route():
    """The mixed int8 tier for conv3_x-class maps (mode 9): 1x1s stay int8
    but the 3x3 runs in-kernel F(2,3) Winograd with a BFLOAT16 filter.
    Must (a) hold the 8-bit tier bound, (b) be at least as accurate as the
    all-int8 direct-im2col route it replaces, (c) auto-route on 28x28."""
    from winograd_tpu.config import BlockConfig
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.kernels.quantized import (
        quantize_stage_params,
        resnet_stage_int8_pallas,
    )

    cfg = BlockConfig("t28", c_io=128, c_mid=32, hw=28, blocks=2)
    case = make_block_case(cfg, seed=28)
    qstacked = quantize_stage_params(block_params_list(cfg, case))
    assert "u2_mid_bf16" in qstacked  # datagen ships the F(2,3) artifact

    gold = case["golden"]
    denom = max(np.abs(gold).max(), 1.0)
    # mid_algo="auto" picks winograd2 at 28x28.
    out_auto = np.asarray(resnet_stage_int8_pallas(case["x"], qstacked))
    out_wino = np.asarray(
        resnet_stage_int8_pallas(case["x"], qstacked, mid_algo="winograd2")
    )
    assert np.abs(out_auto - out_wino).max() == 0.0
    rel_wino = np.abs(out_wino - gold).max() / denom
    assert rel_wino < 5e-2, f"mixed int8/bf16w stage relative error {rel_wino}"

    out_dir = np.asarray(
        resnet_stage_int8_pallas(case["x"], qstacked, mid_algo="direct")
    )
    rel_dir = np.abs(out_dir - gold).max() / denom
    assert rel_wino <= rel_dir * 1.05, (rel_wino, rel_dir)


def test_int8_direct_3x3_matches_golden():
    """The int8 direct 3x3 kernel (modes 0/1's serving tier) stays inside
    the 8-bit bound vs the float64 golden on both reference geometries."""
    from winograd_tpu.datagen.generate import make_case
    from winograd_tpu.kernels.quantized import (
        conv3x3_bn_int8_pallas,
        quantize_weights,
    )

    for mode in (0, 1):
        case = make_case(mode, seed=mode)
        w9q, sw = quantize_weights(np.asarray(case["w9"]))
        out = np.asarray(
            conv3x3_bn_int8_pallas(
                case["x"], w9q, sw, case["scale"], case["bias"]
            )
        )
        rel = np.abs(out - case["golden"]).max() / np.abs(case["golden"]).max()
        assert rel < 5e-2, (mode, rel)


def test_int8_direct_3x3_banded_exact():
    """The row-banded grid (the N=32 serving-scale VMEM fix: 56x56x64's
    whole-image column matrix wants 20 MB of scoped VMEM against the 16 MB
    limit) is EXACT vs the whole-image path — the per-row activation quant
    is row-local, so banding changes staging only, not math. Checks the
    auto band choice at the failing geometry, a forced narrower band, the
    halo rows across band boundaries (dense input, not zeros), and the
    tier bound vs the float64 golden."""
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.kernels.quantized import (
        _direct_int8_band_h,
        conv3x3_bn_int8_pallas,
        quantize_weights,
    )
    from winograd_tpu.ops import reference

    h = w = 56
    cin = cout = 64
    assert _direct_int8_band_h(h, w, cin, cout) < h  # auto-banding triggers

    rng = np.random.default_rng(27)
    x = rng.standard_normal((2, h, w, cin), dtype=np.float32)
    wf = (rng.random((cout, cin, 3, 3), dtype=np.float32) - 0.5) * 0.2
    scale = rng.random(cout, dtype=np.float32) + 0.5
    bias = rng.standard_normal(cout, dtype=np.float32) * 0.1
    w9q, sw = quantize_weights(np.asarray(direct_filter(wf)))

    whole = np.asarray(
        conv3x3_bn_int8_pallas(x, w9q, sw, scale, bias, band_h=h)
    )
    auto = np.asarray(conv3x3_bn_int8_pallas(x, w9q, sw, scale, bias))
    forced = np.asarray(
        conv3x3_bn_int8_pallas(x, w9q, sw, scale, bias, band_h=14)
    )
    np.testing.assert_allclose(auto, whole, atol=1e-5)
    np.testing.assert_allclose(forced, whole, atol=1e-5)

    gold = np.stack(
        [
            reference.conv3x3_bn_relu(
                x[i].astype(np.float64),
                wf.astype(np.float64),
                scale.astype(np.float64),
                bias.astype(np.float64),
            )
            for i in range(2)
        ]
    )
    rel = np.abs(auto - gold).max() / np.abs(gold).max()
    assert rel < 5e-2, rel


def test_int8_winograd_3x3_matches_golden():
    """The int8 Winograd F(2,3) kernel (round-4: makes int8 pay on the
    standalone 3x3 modes — no im2col staging) stays inside the 8-bit bound
    on both reference geometries, with and without ReLU, and at batch."""
    from winograd_tpu.datagen.generate import make_case
    from winograd_tpu.kernels.quantized import (
        conv3x3_bn_winograd_int8_pallas,
        quantize_winograd_filter,
    )
    from winograd_tpu.ops import reference

    for mode in (0, 1):
        case = make_case(mode, seed=mode)
        uq, su = quantize_winograd_filter(np.asarray(case["u2"]))
        out = np.asarray(
            conv3x3_bn_winograd_int8_pallas(
                case["x"], uq, su, case["scale"], case["bias"]
            )
        )
        rel = np.abs(out - case["golden"]).max() / np.abs(case["golden"]).max()
        assert rel < 5e-2, (mode, rel)

    # no-ReLU asymmetry + batched (nb auto-select exercises the grid path)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 14, 14, 128), dtype=np.float32)
    w = (rng.random((128, 128, 3, 3), dtype=np.float32) - 0.5) * 0.2
    scale = rng.random(128, dtype=np.float32) + 0.5
    bias = rng.standard_normal(128, dtype=np.float32) * 0.1
    from winograd_tpu.kernels.transforms import transform_filter

    uq, su = quantize_winograd_filter(np.asarray(transform_filter(w, m=2)))
    out = np.asarray(
        conv3x3_bn_winograd_int8_pallas(x, uq, su, scale, bias, relu=False)
    )
    gold = np.stack(
        [
            reference.conv3x3_bn_relu(xi, w, scale, bias, relu=False)
            for xi in x
        ]
    )
    rel = np.abs(out - gold).max() / np.abs(gold).max()
    assert rel < 5e-2, rel
    assert out.min() < 0  # ReLU really off

"""bf16 weight-storage serving tier: accuracy bounds + routing.

The tier rounds weight matrices to bfloat16 offline and streams them at
half the f32 HBM bytes (kernels/direct.py::split_dot "bf16w"); the output
error is set by the weight rounding alone (~2^-9 per weight), bounded by
BF16W_RTOL — the middle tier between the f32 parity bar and int8.
"""

import numpy as np

from winograd_tpu.config import BF16W_RTOL, BF16W_RTOL_BACKBONE


def _rel(out, gold):
    return np.abs(np.asarray(out) - gold).max() / max(np.abs(gold).max(), 1.0)


def test_split_dot_bf16w_error_is_weight_rounding_only():
    """The activation hi/lo split keeps its contribution ~2^-17: the bf16w
    dot must match an exact dot against the ROUNDED weights ~100x tighter
    than the rounding error itself."""
    import jax.numpy as jnp

    from winograd_tpu.kernels.direct import split_dot

    rng = np.random.default_rng(0)
    a = (rng.random((196, 256), dtype=np.float32) - 0.5)
    b = (rng.random((256, 128), dtype=np.float32) - 0.5)
    b_bf16 = jnp.asarray(b).astype(jnp.bfloat16)
    out = np.asarray(split_dot(jnp.asarray(a), b_bf16, "bf16w"))
    exact_rounded = a.astype(np.float64) @ np.asarray(
        b_bf16.astype(jnp.float32), np.float64
    )
    exact = a.astype(np.float64) @ b.astype(np.float64)
    scale = np.abs(exact).max()
    assert np.abs(out - exact_rounded).max() / scale < 1e-5
    assert np.abs(out - exact).max() / scale < BF16W_RTOL


def test_bf16w_layer_kernels():
    """The standalone layer kernels at the bf16w tier — every reference case
    family (modes 0-5) runs the tier, not just the composed blocks: the
    F(2,3) winograd kernel, the direct im2col kernel, and the pointwise
    kernel with a bfloat16-rounded weight artifact."""
    from winograd_tpu.config import CASES
    from winograd_tpu.datagen.generate import make_pointwise_case, make_winograd_case
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas
    from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
    from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas

    case = make_winograd_case(CASES[0], seed=20)
    out = conv3x3_bn_winograd_pallas(
        case["x"], case["u2"], case["scale"], case["bias"], relu=True,
        precision="bf16w",
    )
    rel = _rel(out, case["golden"])
    assert rel < BF16W_RTOL, f"bf16w winograd2 layer relative error {rel}"

    out_d = conv3x3_bn_direct_pallas(
        case["x"], case["w9"], case["scale"], case["bias"], relu=True,
        precision="bf16w",
    )
    rel_d = _rel(out_d, case["golden"])
    assert rel_d < BF16W_RTOL, f"bf16w direct layer relative error {rel_d}"

    pcase = make_pointwise_case(CASES[3], seed=21)
    out_p = conv1x1_bn_pallas(
        pcase["x"], pcase["w"], pcase["scale"], pcase["bias"], relu=False,
        precision="bf16w",
    )
    rel_p = _rel(out_p, pcase["golden"])
    assert rel_p < BF16W_RTOL, f"bf16w pointwise layer relative error {rel_p}"


def test_bf16w_block_megakernel():
    from winograd_tpu.config import CASES
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.kernels.block import bottleneck_block_fused_pallas

    case = make_block_case(CASES[6], seed=6)
    params = block_params_list(CASES[6], case)[0]
    out = bottleneck_block_fused_pallas(case["x"], params, precision="bf16w")
    rel = _rel(out, case["golden"])
    assert rel < BF16W_RTOL, f"bf16w block relative error {rel}"
    corr = np.corrcoef(np.asarray(out).ravel(), case["golden"].ravel())[0, 1]
    assert corr > 0.99999


def test_bf16w_stage_streaming_single_and_multi_block():
    """The streaming stage kernel at the bf16w tier — the conv5_x lever —
    for a multi-block stage AND a single streamed block (the route
    resnet_stage_pallas takes for conv5_x under precision='bf16w')."""
    from winograd_tpu.config import BlockConfig
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.models.resnet import resnet_stage_pallas

    cfg = BlockConfig("t", c_io=128, c_mid=32, hw=7, blocks=2)
    case = make_block_case(cfg, seed=9)
    out = resnet_stage_pallas(
        case["x"], block_params_list(cfg, case), precision="bf16w"
    )
    rel = _rel(out, case["golden"])
    assert rel < BF16W_RTOL, f"bf16w stage relative error {rel}"

    cfg1 = BlockConfig("t1", c_io=128, c_mid=32, hw=7, blocks=1)
    case1 = make_block_case(cfg1, seed=10)
    out1 = resnet_stage_pallas(
        case1["x"], block_params_list(cfg1, case1), precision="bf16w"
    )
    rel1 = _rel(out1, case1["golden"])
    assert rel1 < BF16W_RTOL, f"single-block bf16w stream relative error {rel1}"


def test_bf16w_winograd2_mid_layer_stage():
    """Large-map stage (28x28-class geometry) routes the F(2,3) winograd
    mid-layer with a bf16 U artifact; its +-1 transforms must not amplify
    the rounding past the tier bound."""
    from winograd_tpu.config import BlockConfig
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.models.resnet import resnet_stage_pallas

    cfg = BlockConfig("t", c_io=64, c_mid=32, hw=28, blocks=2)
    case = make_block_case(cfg, seed=11)
    out = resnet_stage_pallas(
        case["x"], block_params_list(cfg, case), precision="bf16w"
    )
    rel = _rel(out, case["golden"])
    assert rel < BF16W_RTOL, f"bf16w winograd2-stage relative error {rel}"


def test_bf16w_transition_and_backbone():
    import jax.numpy as jnp

    from winograd_tpu.config import CASES, TransitionConfig
    from winograd_tpu.datagen.generate import (
        backbone_stages,
        make_case,
        make_transition_case,
        transition_params,
    )
    from winograd_tpu.kernels.transition import transition_block_fused_pallas
    from winograd_tpu.models.downsample import resnet50_stages

    tcfg = TransitionConfig("t", 128, 64, 256, hw=14)
    tcase = make_transition_case(tcfg, seed=5)
    out = transition_block_fused_pallas(
        jnp.asarray(tcase["x"]), transition_params(tcase), precision="bf16w"
    )
    rel = _rel(out, tcase["golden"])
    assert rel < BF16W_RTOL, f"bf16w transition relative error {rel}"

    case = make_case(13, seed=13)
    stages = backbone_stages(CASES[13], case)
    outb = resnet50_stages(jnp.asarray(case["x"]), stages, precision="bf16w")
    relb = _rel(outb, case["golden"])
    assert relb < BF16W_RTOL_BACKBONE, f"bf16w backbone relative error {relb}"
    corr = np.corrcoef(np.asarray(outb).ravel(), case["golden"].ravel())[0, 1]
    assert corr > 0.9999

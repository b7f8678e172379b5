"""Stride-2 transition blocks and the multi-stage backbone composition."""

import numpy as np
import jax
import jax.numpy as jnp

from winograd_tpu.config import PARITY_ATOL
from winograd_tpu.kernels.direct import direct_filter
from winograd_tpu.models.downsample import (
    conv3x3_s2_bn_relu_pallas,
    downsample_bottleneck_block_pallas,
    resnet50_stages,
)
from winograd_tpu.ops import reference


def _rand(rng, *shape):
    return (rng.random(shape, dtype=np.float32) - 0.5)


def test_stride2_conv3x3_matches_golden():
    rng = np.random.default_rng(0)
    x = _rand(rng, 28, 28, 128)
    w = _rand(rng, 64, 128, 3, 3)
    s, b = _rand(rng, 64), _rand(rng, 64)
    gold = reference.bn_act(reference.conv3x3_stride2(x, w), s, b, relu=True).astype(np.float32)
    out = np.asarray(
        conv3x3_s2_bn_relu_pallas(x, np.asarray(direct_filter(w)), s, b, relu=True)
    )
    assert out.shape == (14, 14, 64)
    np.testing.assert_allclose(out, gold, atol=PARITY_ATOL)


def _make_transition(rng, c_in, c_mid, c_out):
    w_mid = _rand(rng, c_mid, c_mid, 3, 3)
    return dict(
        w_reduce=_rand(rng, c_in, c_mid), s_reduce=_rand(rng, c_mid), b_reduce=_rand(rng, c_mid),
        w_mid=w_mid, w9_mid=np.asarray(direct_filter(w_mid)),
        s_mid=_rand(rng, c_mid), b_mid=_rand(rng, c_mid),
        w_expand=_rand(rng, c_mid, c_out), s_expand=_rand(rng, c_out), b_expand=_rand(rng, c_out),
        w_proj=_rand(rng, c_in, c_out), s_proj=_rand(rng, c_out), b_proj=_rand(rng, c_out),
    )


def test_downsample_block_matches_golden():
    rng = np.random.default_rng(1)
    c_in, c_mid, c_out = 128, 64, 256
    x = _rand(rng, 28, 28, c_in)
    p = _make_transition(rng, c_in, c_mid, c_out)
    gold = reference.downsample_bottleneck_block(
        x,
        p["w_reduce"], p["s_reduce"], p["b_reduce"],
        p["w_mid"], p["s_mid"], p["b_mid"],
        p["w_expand"], p["s_expand"], p["b_expand"],
        p["w_proj"], p["s_proj"], p["b_proj"],
    )
    # Fused transition megakernel (the default): strict 1e-4 bar.
    out = np.asarray(downsample_bottleneck_block_pallas(x, p))
    assert out.shape == (14, 14, c_out)
    assert np.abs(out - gold).max() <= PARITY_ATOL
    # Composed per-layer path (bf16x3 pointwise GEMMs): its own tier.
    out_c = np.asarray(downsample_bottleneck_block_pallas(x, p, algo="composed"))
    assert np.abs(out_c - gold).max() < 10 * PARITY_ATOL


def test_fused_transition_batched_and_streamed():
    """Batched input + output-channel streaming (tile_co < Cout) in the
    fused transition kernel."""
    from winograd_tpu.kernels.transition import transition_block_fused_pallas

    rng = np.random.default_rng(7)
    c_in, c_mid, c_out = 128, 64, 256
    x = _rand(rng, 2, 14, 14, c_in)
    p = _make_transition(rng, c_in, c_mid, c_out)
    gold = np.stack([
        reference.downsample_bottleneck_block(
            x[i],
            p["w_reduce"], p["s_reduce"], p["b_reduce"],
            p["w_mid"], p["s_mid"], p["b_mid"],
            p["w_expand"], p["s_expand"], p["b_expand"],
            p["w_proj"], p["s_proj"], p["b_proj"],
        )
        for i in range(2)
    ])
    out = np.asarray(transition_block_fused_pallas(x, p, tile_co=128))
    assert out.shape == (2, 7, 7, c_out)
    assert np.abs(out - gold).max() <= PARITY_ATOL


def test_jnp_downsample_matches_golden_and_is_differentiable():
    from winograd_tpu.ops import jnp_ops

    rng = np.random.default_rng(3)
    c_in, c_mid, c_out = 64, 32, 128
    x = _rand(rng, 14, 14, c_in)
    p = _make_transition(rng, c_in, c_mid, c_out)
    gold = reference.downsample_bottleneck_block(
        x,
        p["w_reduce"], p["s_reduce"], p["b_reduce"],
        p["w_mid"], p["s_mid"], p["b_mid"],
        p["w_expand"], p["s_expand"], p["b_expand"],
        p["w_proj"], p["s_proj"], p["b_proj"],
    )
    out = np.asarray(jnp_ops.downsample_bottleneck_block(x, p))
    np.testing.assert_allclose(out, gold, atol=1e-4)
    # Gradients flow (training path for stage transitions).
    loss = lambda w: jnp.sum(jnp_ops.downsample_bottleneck_block(x, {**p, "w_mid": w}) ** 2)
    g = jax.grad(loss)(jnp.asarray(p["w_mid"]))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_backbone_case_matches_golden():
    """Bench mode 13: the full 13-block ResNet-50 backbone case (28->14->7
    with two fused transitions) matches its float64 golden chain."""
    from winograd_tpu.config import CASES
    from winograd_tpu.datagen.generate import backbone_stages, make_case

    cfg = CASES[13]
    case = make_case(13, seed=13)
    stages = backbone_stages(cfg, case)
    assert len(stages) == 3 and stages[0]["transition"] is None
    out = np.asarray(resnet50_stages(jnp.asarray(case["x"]), stages))
    assert out.shape == (7, 7, 2048)
    assert np.abs(out - case["golden"]).max() <= PARITY_ATOL


def test_multi_stage_backbone_composes():
    """28x28 stage -> transition -> 14x14 stage -> transition -> 7x7."""
    from winograd_tpu.models.resnet import init_bottleneck_params

    rng = np.random.default_rng(2)
    stages = [
        {"transition": None, "blocks": [init_bottleneck_params(0, c_io=128, c_mid=128)]},
        {"transition": _make_transition(rng, 128, 128, 256),
         "blocks": [init_bottleneck_params(1, c_io=256, c_mid=128)]},
        {"transition": _make_transition(rng, 256, 128, 512),
         "blocks": [init_bottleneck_params(2, c_io=512, c_mid=128)]},
    ]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 28, 28, 128), jnp.float32) * 0.1
    out = resnet50_stages(x, stages)
    assert out.shape == (2, 7, 7, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_transition_weight_resident_batched():
    """Batched inputs take the tile-outer weight-resident transition layout
    (kernels/transition.py::_transition_kernel_resident — the wide expand/
    projection weights stream once for the whole batch). Must match the
    per-image kernel and the golden."""
    from winograd_tpu.config import CASES
    from winograd_tpu.datagen.generate import make_transition_case, transition_params
    from winograd_tpu.kernels.transition import transition_block_fused_pallas

    cfg = CASES[11]
    case = make_transition_case(cfg, seed=51)
    params = transition_params(case)
    x1 = case["x"]
    xb = np.stack([x1, 0.5 * x1, -x1])
    # tile_co=128 forces n_j > 1 so the batched call takes the resident
    # layout (at n_j == 1 it deliberately keeps the image-outer kernel).
    out_b = np.asarray(
        transition_block_fused_pallas(xb, params, tile_co=128, resident=True)
    )
    per_img = np.stack(
        [
            np.asarray(transition_block_fused_pallas(xb[i], params))
            for i in range(xb.shape[0])
        ]
    )
    assert np.abs(out_b - per_img).max() < PARITY_ATOL
    assert np.abs(out_b[0] - case["golden"]).max() < 10 * PARITY_ATOL
    out_bf = np.asarray(
        transition_block_fused_pallas(
            xb, params, tile_co=128, precision="bf16w", resident=True
        )
    )
    rel = np.abs(out_bf - per_img).max() / np.abs(per_img).max()
    assert rel < 5e-3, rel


def test_full_resnet50_trunk_16_blocks():
    """Mode 15: the COMPLETE ResNet-50 residual trunk — conv2_x (56x56)
    through conv5_x (7x7), 16 bottleneck blocks, three fused stride-2
    transitions — through the serving kernels, vs the float64 golden."""
    from winograd_tpu.config import CASES
    from winograd_tpu.datagen.generate import backbone_stages, make_backbone_case
    from winograd_tpu.models.downsample import resnet50_stages

    cfg = CASES[15]
    assert cfg.stages[0] == (256, 64, 56, 3)
    case = make_backbone_case(cfg, seed=15)
    stages = backbone_stages(cfg, case)
    out = np.asarray(resnet50_stages(case["x"], stages))
    assert out.shape == (7, 7, 2048)
    err = np.abs(out - case["golden"]).max()
    assert err < 10 * PARITY_ATOL, err

"""ResNet-18/34: the BASIC-block family (modes 23/24).

The reference scopes to bottleneck layers (report.pdf section 1); the basic
family is the other half of the standard ResNet model space and must compose
entirely from existing kernels (models/basic.py). These tests pin the
configs' structure + textbook FLOPs, the bench-only artifact contract, tiny
end-to-end parity at every serving tier, the training path, the
checkpoint->serving pipeline, and the engine surface (real depths run on
TPU in the sweep)."""

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.config import (
    BF16W_RTOL_BACKBONE,
    CASES,
    INT8_RTOL_BACKBONE,
    PARITY_ATOL,
    BasicNetConfig,
    ResNet34Config,
    case_flops,
)
from winograd_tpu.datagen.generate import make_basicnet_case
from winograd_tpu.models.basic import (
    basicnet_forward_int8,
    basicnet_forward_pallas,
    basicnet_forward_train,
    basicnet_forward_xla,
    basicnet_params,
    quantize_basicnet,
)


@dataclasses.dataclass(frozen=True)
class _Tiny(BasicNetConfig):
    """Two stages: stage 0 all-identity (the ResNet-18 layer1 shape), one
    stride-2 entry into stage 1 — every block kind the family has."""

    stages = ((16, 16, 2), (32, 8, 2))
    img: int = 32
    stem_c: int = 16
    num_classes: int = 16


def _rel(a, gold):
    g = np.asarray(gold, np.float64)
    return np.abs(np.asarray(a, np.float64) - g).max() / np.abs(g).max()


def test_basic_configs_registered():
    from winograd_tpu.config import BasicTrainConfig

    assert isinstance(CASES[23], BasicNetConfig)
    assert isinstance(CASES[24], ResNet34Config)
    assert isinstance(CASES[25], BasicTrainConfig)
    # Train step ~ 3x the forward FLOPs (the mode-19 convention).
    assert case_flops(CASES[25]) == 3 * case_flops(CASES[23])

    def total_blocks(cfg):
        return sum(b for _c, _hw, b in cfg.stages)

    assert total_blocks(CASES[23]) == 8   # ResNet-18: 2/2/2/2
    assert total_blocks(CASES[24]) == 16  # ResNet-34: 3/4/6/3
    # Nominal FLOPs must match the textbook 1.82/3.66 GMACs ladder.
    for mode, gmacs in ((23, 1.82), (24, 3.66)):
        assert case_flops(CASES[mode]) / 2e9 == pytest.approx(gmacs, abs=0.03)


def test_basic_cases_are_bench_only(tmp_path):
    """No on-disk npz for the whole classifiers; load_case regenerates in
    memory from the dir's recorded seed (same contract as modes 16-21)."""
    from winograd_tpu.datagen.generate import load_case

    d = str(tmp_path)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"seed": 7}, f)

    assert not CASES[23].on_disk and not CASES[24].on_disk
    CASES[991] = _Tiny("tiny_basic_bench_only")
    try:
        case = load_case(991, d)
    finally:
        del CASES[991]
    assert case["x"].shape == (32, 32, 3)
    assert case["golden"].shape == (16,)
    # Stage 0 is all identity blocks (no t0_ entry), stage 1 enters strided.
    assert not any(k.startswith("t0_") for k in case)
    assert any(k.startswith("t1_") for k in case)


def test_tiny_basicnet_all_tiers():
    """Tiny end-to-end classifier vs the float64 golden at every tier."""
    cfg = _Tiny("tiny_basic_tiers")
    case = make_basicnet_case(cfg, seed=5)
    params = basicnet_params(case, cfg)
    x = jnp.asarray(case["x"])
    gold = case["golden"]

    out = np.asarray(basicnet_forward_pallas(x, params))
    assert np.abs(out - gold).max() < 10 * PARITY_ATOL
    out_xla = np.asarray(basicnet_forward_xla(x, params))
    assert np.abs(out_xla - gold).max() < 10 * PARITY_ATOL
    assert _rel(
        basicnet_forward_pallas(x, params, precision="bf16w"), gold
    ) < BF16W_RTOL_BACKBONE
    assert _rel(
        basicnet_forward_int8(x, quantize_basicnet(params)), gold
    ) < INT8_RTOL_BACKBONE

    # Preprocessed-input contract == raw-image route exactly.
    from winograd_tpu.kernels.stem import stem_prepare_input
    from winograd_tpu.models.basic import basicnet_forward_pre

    out_pre = np.asarray(
        basicnet_forward_pre(
            stem_prepare_input(x), params, h=cfg.img, w=cfg.img
        )
    ).reshape(np.asarray(gold).shape)
    np.testing.assert_array_equal(out_pre, out)


def test_basic_stage_fused_kernel_matches_xla_chain():
    """The fused basic-stage kernel (one weight-streaming pallas_call for a
    run of identity blocks) vs the chained XLA basic blocks, f32 + bf16w."""
    from winograd_tpu.kernels.basic_stage import (
        basic_stage_fused_pallas,
        stack_basic_stage_params,
    )
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.ops import jnp_ops

    rng = np.random.default_rng(17)
    c, h, w = 32, 8, 8
    blocks = []
    for _ in range(2):
        b = {}
        for leg in ("a", "b"):
            wf = rng.standard_normal((c, c, 3, 3), np.float32) * 0.2
            b[f"w_{leg}"] = jnp.asarray(wf)
            b[f"w9_{leg}"] = direct_filter(wf)
            b[f"s_{leg}"] = jnp.asarray(rng.standard_normal(c, np.float32) * 0.1 + 1)
            b[f"b_{leg}"] = jnp.asarray(rng.standard_normal(c, np.float32) * 0.1)
        blocks.append(b)
    x = jnp.asarray(rng.standard_normal((h, w, c), np.float32))

    want = x
    for b in blocks:
        want = jnp_ops.basic_block(want, b)
    want = np.asarray(want)

    stacked = stack_basic_stage_params(blocks)
    got = np.asarray(basic_stage_fused_pallas(x, stacked))
    # Two chained blocks amplify magnitudes (|y| ~ 1e2 here), so the bar is
    # relative: 1e-5 distinguishes a real defect from f32 reassociation.
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    got_b = np.asarray(basic_stage_fused_pallas(x, stacked, precision="bf16w"))
    assert np.abs(got_b - want).max() / np.abs(want).max() < 5e-3

    # Batched input: image-outer grid, same per-image results. Image 1 is
    # checked against its OWN single-image run — a scratch-carryover bug
    # across the image grid axis (e.g. a broken b==0 act reload) would
    # corrupt image 1 while leaving image 0 correct.
    xb = jnp.stack([x, x * 0.5])
    got2 = np.asarray(basic_stage_fused_pallas(xb, stacked))
    np.testing.assert_allclose(got2[0], got, atol=1e-5)
    got_half = np.asarray(basic_stage_fused_pallas(x * 0.5, stacked))
    np.testing.assert_allclose(got2[1], got_half, atol=1e-5)

    # int8 twin: per-channel weight + per-row activation scales.
    from winograd_tpu.kernels.basic_stage import (
        basic_stage_int8_pallas,
        quantize_basic_stage_params,
    )

    got_q = np.asarray(
        basic_stage_int8_pallas(x, quantize_basic_stage_params(blocks))
    )
    assert np.abs(got_q - want).max() / np.abs(want).max() < 5e-2


def test_basicnet_fused_stage_route_end_to_end():
    """attach_fused_stage_artifacts + the trace-time small-map gate: the
    tiny classifier's 8x8 stage runs through the fused basic-stage kernel
    and the logits still meet golden parity (f32 and bf16w)."""
    from winograd_tpu.models.basic import attach_fused_stage_artifacts

    cfg = _Tiny("tiny_basic_fusedstage")
    case = make_basicnet_case(cfg, seed=21)
    params = attach_fused_stage_artifacts(
        basicnet_params(case, cfg), min_channels=0
    )
    # The 8x8 stage now carries the stacked artifact (the 16x16 stage's
    # map is above the small-map gate, so stacking it is harmless).
    assert "fused" in params["stages"][1]
    x = jnp.asarray(case["x"])
    gold = case["golden"]
    out = np.asarray(basicnet_forward_pallas(x, params))
    assert np.abs(out - gold).max() < 10 * PARITY_ATOL
    assert _rel(
        basicnet_forward_pallas(x, params, precision="bf16w"), gold
    ) < BF16W_RTOL_BACKBONE
    # int8 tier: quantize_basicnet mirrors the attached artifact, so the
    # same stage runs through the fused int8 stage kernel.
    qparams = quantize_basicnet(params)
    assert "fused" in qparams["stages"][1]
    assert _rel(basicnet_forward_int8(x, qparams), gold) < INT8_RTOL_BACKBONE


def test_tiny_basicnet_train_step():
    """The training path: fused-kernel forward matches the golden, and a
    train step's loss+grad-norm scalar agrees with all-XLA autodiff."""
    import jax

    from winograd_tpu.models.train import trainable_basicnet_params

    cfg = _Tiny("tiny_basic_train")
    case = make_basicnet_case(cfg, seed=11)
    full = basicnet_params(case, cfg)
    params = trainable_basicnet_params(full)
    x = jnp.asarray(case["x"])
    out = np.asarray(basicnet_forward_train(x, params))
    assert np.abs(out - case["golden"]).max() < 10 * PARITY_ATOL

    def _step(fwd):
        def loss(p, x_):
            o = fwd(x_, p)
            return jnp.sum(o * o)

        def step(x_):
            l, g = jax.value_and_grad(loss)(params, x_)
            return l + sum(
                jnp.vdot(leaf, leaf) for leaf in jax.tree_util.tree_leaves(g)
            )

        return jax.jit(step)

    gp = float(_step(basicnet_forward_train)(x))
    gx = float(_step(lambda x_, p: basicnet_forward_xla(x_, p))(x))
    assert abs(gp - gx) / max(abs(gx), 1.0) < 1e-3


def test_basicnet_checkpoint_serving_pipeline(tmp_path):
    """train-params checkpoint -> prepare_basicnet_serving -> engine: the
    offline-derived layouts must reproduce the golden logits."""
    from winograd_tpu.engine import ResNetBasicEngine
    from winograd_tpu.models.checkpoint import save_model
    from winograd_tpu.models.train import trainable_basicnet_params

    cfg = _Tiny("tiny_basic_ckpt")
    case = make_basicnet_case(cfg, seed=3)
    full = basicnet_params(case, cfg)
    path = os.path.join(str(tmp_path), "basic.npz")
    save_model(path, trainable_basicnet_params(full), {"epoch": 1})

    eng = ResNetBasicEngine.from_checkpoint(path)
    out = np.asarray(eng(jnp.asarray(case["x"])))
    assert np.abs(out - case["golden"]).max() < 10 * PARITY_ATOL


def test_basicnet_engine_tiers_and_mesh():
    """Engine surface: from_case at every tier, classify, and the
    data-parallel mesh path matching single-device logits."""
    import jax
    from jax.sharding import Mesh

    from winograd_tpu.engine import ResNetBasicEngine

    cfg = _Tiny("tiny_basic_engine")
    case = make_basicnet_case(cfg, seed=9)
    gold = case["golden"]
    x = jnp.asarray(case["x"])

    eng = ResNetBasicEngine.from_case(case, cfg)
    out = np.asarray(eng(x))
    assert np.abs(out - gold).max() < 10 * PARITY_ATOL
    assert int(eng.classify(x)) == int(np.argmax(gold))
    for tier, bound in (("bf16w", BF16W_RTOL_BACKBONE), ("int8", INT8_RTOL_BACKBONE)):
        assert _rel(
            ResNetBasicEngine.from_case(case, cfg, tier=tier)(x), gold
        ) < bound

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    eng_dp = ResNetBasicEngine.from_case(case, cfg, mesh=mesh)
    xb = jnp.stack([x, x * 0.5, x * 0.25, x * 2.0])
    ref = np.asarray(eng(xb))
    got = np.asarray(eng_dp(xb))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_run_case_basic_train_quick():
    """The mode-25 CLI branch end to end on a tiny registered config:
    forward parity vs the golden AND the hard train-step grad check."""
    from winograd_tpu.bench.cli import run_case
    from winograd_tpu.config import BasicTrainConfig

    @dataclasses.dataclass(frozen=True)
    class _TinyTrain(BasicTrainConfig):
        stages = ((16, 4, 1), (32, 2, 1))
        img: int = 16
        stem_c: int = 16
        num_classes: int = 16

    CASES[992] = _TinyTrain("tiny_basic_trainstep")
    try:
        r = run_case(992, iterations=2, warmup=1)
    finally:
        del CASES[992]
    assert r["parity_ok"]
    assert r["train_grad_rel_error"] < 1e-3


def test_basicnet_torch_import_cross_validated():
    """torchvision-format BasicBlock state_dict -> serving params, cross-
    validated against torch's OWN conv backend (independent reference),
    all tiers — plus the wrong-family guardrails."""
    torch = pytest.importorskip("torch")

    from winograd_tpu.engine import ResNetBasicEngine
    from winograd_tpu.models.import_torch import (
        basicnet_train_params_from_torch,
        build_torch_reference_resnet,
        resnet_train_params_from_torch,
    )

    model = build_torch_reference_resnet(
        layers=(2, 2), stem_c=16, planes=(16, 32), classes=16, seed=21,
        block="basic",
    )
    sd = model.state_dict()

    with pytest.raises(ValueError, match="BasicBlock"):
        resnet_train_params_from_torch(sd)

    eng = ResNetBasicEngine.from_torch(sd)
    x = np.random.default_rng(2).standard_normal((32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x[None].transpose(0, 3, 1, 2)))[0].numpy()
    out = np.asarray(eng(jnp.asarray(x)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-4

    for tier, bound in (("bf16w", BF16W_RTOL_BACKBONE), ("int8", INT8_RTOL_BACKBONE)):
        t_out = np.asarray(ResNetBasicEngine.from_torch(sd, tier=tier)(jnp.asarray(x)))
        assert _rel(t_out, ref) < bound

    # And the bottleneck importer path refuses basic checkpoints' twin.
    bott = build_torch_reference_resnet(
        layers=(2,), stem_c=16, planes=(4,), classes=16, seed=22
    )
    with pytest.raises(ValueError, match="Bottleneck"):
        basicnet_train_params_from_torch(bott.state_dict())

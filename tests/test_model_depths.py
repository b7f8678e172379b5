"""ResNet-101/152: the deeper standard bottleneck family (modes 20/21).

The whole serving stack is parameterized by cfg.stages, so the deeper
variants must compose with no new kernels — these tests pin the configs'
structure, the bench-only artifact contract, and end-to-end parity of a
tiny multi-block-deep variant (real depths run on TPU in the sweep)."""

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.config import (
    CASES,
    PARITY_ATOL,
    ResNet50Config,
    ResNet101Config,
    ResNet152Config,
    case_flops,
)


def test_depth_configs_registered():
    assert isinstance(CASES[20], ResNet101Config)
    assert isinstance(CASES[21], ResNet152Config)
    # Standard depths: 1 entry + sum(identity) + 3 transitions + stem/head.
    def total_blocks(cfg):
        return 1 + sum(b for *_s, b in cfg.stages) + (len(cfg.stages) - 1)

    assert total_blocks(CASES[16]) == 16       # ResNet-50 bottlenecks
    assert total_blocks(CASES[20]) == 33       # ResNet-101 bottlenecks
    assert total_blocks(CASES[21]) == 50       # ResNet-152 bottlenecks
    # Nominal FLOPs must match the textbook 4.09/7.80/11.52 GMACs ladder.
    for mode, gmacs in ((16, 4.09), (20, 7.80), (21, 11.52)):
        assert case_flops(CASES[mode]) / 2e9 == pytest.approx(gmacs, abs=0.03)


def test_depth_cases_are_bench_only(tmp_path):
    """generate_all must skip the deep whole models (their npz would be
    100s of MB); load_case must regenerate them in memory from the dir's
    recorded seed instead of FileNotFoundError."""
    from winograd_tpu.datagen.generate import load_case

    d = str(tmp_path)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"seed": 3}, f)

    assert not CASES[20].on_disk and not CASES[21].on_disk
    # Regeneration path: tiny stand-in so the test stays fast; the real
    # mode-20/21 regeneration runs the same branch (on_disk=False).
    @dataclasses.dataclass(frozen=True)
    class _TinyDeep(ResNet101Config):
        stages = ((64, 16, 8, 2), (128, 32, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    CASES[990] = _TinyDeep("tiny_deep_bench_only")
    try:
        case = load_case(990, d)
    finally:
        del CASES[990]
    assert case["x"].shape == (32, 32, 3)
    assert case["golden"].shape == (16,)


def test_tiny_deep_variant_all_tiers():
    """A multi-block-deep tiny classifier (blocks > 1 in every stage, three
    transitions — the structural shape of ResNet-101/152) through all
    serving tiers vs the float64 golden."""
    from winograd_tpu.config import BF16W_RTOL_BACKBONE, INT8_RTOL_BACKBONE
    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models.resnet50 import (
        quantize_resnet50,
        resnet50_forward_int8,
        resnet50_forward_pallas,
        resnet50_forward_xla,
        resnet50_params,
    )

    @dataclasses.dataclass(frozen=True)
    class _TinyDeep(ResNet50Config):
        stages = (
            (64, 16, 16, 2),
            (128, 32, 8, 3),
            (128, 32, 4, 2),
            (128, 32, 2, 2),
        )
        img: int = 64
        stem_c: int = 16
        num_classes: int = 32

    cfg = _TinyDeep("tiny_deep_tiers")
    case = make_resnet50_case(cfg, seed=13)
    params = resnet50_params(case, cfg)
    x = jnp.asarray(case["x"])
    gold = case["golden"]

    def rel(a):
        g = np.asarray(gold, np.float64)
        return np.abs(np.asarray(a, np.float64) - g).max() / np.abs(g).max()

    out = np.asarray(resnet50_forward_pallas(x, params))
    assert np.abs(out - gold).max() < 10 * PARITY_ATOL
    out_xla = np.asarray(resnet50_forward_xla(x, params))
    assert np.abs(out_xla - gold).max() < 10 * PARITY_ATOL
    assert rel(resnet50_forward_pallas(x, params, precision="bf16w")) < BF16W_RTOL_BACKBONE
    assert rel(resnet50_forward_int8(x, quantize_resnet50(params))) < INT8_RTOL_BACKBONE


def test_tiny_deep_variant_train_step():
    """The training path composes the deeper family too: fused-kernel
    forward matches the golden and a train step's loss+grad-norm scalar
    agrees with the all-XLA autodiff step on a multi-block-deep variant."""
    import jax

    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models import trainable_resnet50_params
    from winograd_tpu.models.resnet50 import (
        resnet50_forward_train,
        resnet50_forward_xla,
        resnet50_params,
    )

    @dataclasses.dataclass(frozen=True)
    class _TinyDeep(ResNet50Config):
        stages = ((64, 16, 8, 2), (128, 32, 4, 3), (128, 32, 2, 2))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    cfg = _TinyDeep("tiny_deep_train")
    case = make_resnet50_case(cfg, seed=17)
    full = resnet50_params(case, cfg)
    params = trainable_resnet50_params(full)
    x = jnp.asarray(case["x"])
    out = np.asarray(resnet50_forward_train(x, params))
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

    gp = float(_step(resnet50_forward_train)(x))
    gx = float(_step(resnet50_forward_xla)(x))
    assert abs(gp - gx) / max(abs(gx), 1.0) < 1e-3

"""bf16 weight-STORAGE training tier (VERDICT r4 item 3): the forward runs
the bf16w serving kernels on bf16 copies of the f32 master weights; the
backward stays the f32/HIGH rematerializing math. Gates: the train-step
scalar (loss + grad norms) agrees with the all-XLA f32 autodiff step within
BF16W_TRAIN_GRAD_RTOL, and the tier forward stays within the serving bf16w
bound of the float64 golden."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.config import (
    BF16W_RTOL_BACKBONE,
    BF16W_TRAIN_GRAD_RTOL,
    BasicNetConfig,
    ResNet50Config,
)


def _step_scalar(fwd, params, x):
    """The bench's train-step protocol: scalar loss + every grad leaf's
    norm folded in, so all gradients stay live."""

    def loss(p, x_):
        out = fwd(x_, p)
        return jnp.sum(out * out)

    def step(x_):
        l, g = jax.value_and_grad(loss)(params, x_)
        return l + sum(
            jnp.vdot(leaf, leaf) for leaf in jax.tree_util.tree_leaves(g)
        )

    return float(jax.jit(step)(x))


def test_resnet50_train_bf16w_tier():
    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models.resnet50 import (
        resnet50_forward_train,
        resnet50_forward_xla,
        resnet50_params,
    )
    from winograd_tpu.models.train import trainable_resnet50_params

    @dataclasses.dataclass(frozen=True)
    class _Tiny(ResNet50Config):
        stages = ((32, 16, 8, 1), (64, 16, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    cfg = _Tiny("tiny_r50_bf16w_train")
    case = make_resnet50_case(cfg, seed=7)
    params = trainable_resnet50_params(resnet50_params(case, cfg))
    x = jnp.asarray(case["x"])

    gx = _step_scalar(resnet50_forward_xla, params, x)
    gb = _step_scalar(
        lambda x_, p_: resnet50_forward_train(x_, p_, "bf16w"), params, x
    )
    assert abs(gb - gx) / max(abs(gx), 1.0) < BF16W_TRAIN_GRAD_RTOL

    # The tier FORWARD (what the step trains through) stays a valid bf16w
    # serving forward: within the tier bound of the float64 golden.
    out = np.asarray(resnet50_forward_train(x, params, "bf16w"))
    g = np.asarray(case["golden"])
    assert np.abs(out - g).max() / np.abs(g).max() < BF16W_RTOL_BACKBONE


def test_basicnet_train_bf16w_tier():
    from winograd_tpu.datagen.generate import make_basicnet_case
    from winograd_tpu.models.basic import (
        basicnet_forward_train,
        basicnet_forward_xla,
        basicnet_params,
    )
    from winograd_tpu.models.train import trainable_basicnet_params

    @dataclasses.dataclass(frozen=True)
    class _TinyB(BasicNetConfig):
        stages = ((16, 16, 2), (32, 8, 2))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    cfg = _TinyB("tiny_basic_bf16w_train")
    case = make_basicnet_case(cfg, seed=8)
    params = trainable_basicnet_params(basicnet_params(case, cfg))
    x = jnp.asarray(case["x"])

    gx = _step_scalar(basicnet_forward_xla, params, x)
    gb = _step_scalar(
        lambda x_, p_: basicnet_forward_train(x_, p_, "bf16w"), params, x
    )
    assert abs(gb - gx) / max(abs(gx), 1.0) < BF16W_TRAIN_GRAD_RTOL

    out = np.asarray(basicnet_forward_train(x, params, "bf16w"))
    g = np.asarray(case["golden"])
    assert np.abs(out - g).max() / np.abs(g).max() < BF16W_RTOL_BACKBONE


def test_basicnet_streamed_stage_train_route():
    """The fused basic-stage TRAIN route (basic_stage_train_streamed) on a
    tiny model: fused_min_channels=0 opts the small-map stage into the
    weight-streaming forward exactly as a custom
    attach_fused_stage_artifacts(min_channels=0) serving deployment would,
    keeping the trained forward == served forward invariant testable on
    CPU (ImageNet-width thresholds would otherwise leave this path
    TPU-bench-only). Checks the f32 and bf16w tiers' step scalars against
    the all-XLA autodiff step."""
    from winograd_tpu.datagen.generate import make_basicnet_case
    from winograd_tpu.models.basic import (
        basicnet_forward_train,
        basicnet_forward_xla,
        basicnet_params,
    )
    from winograd_tpu.models.train import trainable_basicnet_params

    @dataclasses.dataclass(frozen=True)
    class _TinyS(BasicNetConfig):
        stages = ((16, 16, 2), (32, 8, 2))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    cfg = _TinyS("tiny_streamed_train")
    case = make_basicnet_case(cfg, seed=9)
    params = trainable_basicnet_params(basicnet_params(case, cfg))
    x = jnp.asarray(case["x"])

    gx = _step_scalar(basicnet_forward_xla, params, x)
    gp = _step_scalar(
        lambda x_, p_: basicnet_forward_train(x_, p_, fused_min_channels=0),
        params, x,
    )
    assert abs(gp - gx) / max(abs(gx), 1.0) < 1e-3
    gb = _step_scalar(
        lambda x_, p_: basicnet_forward_train(
            x_, p_, "bf16w", fused_min_channels=0
        ),
        params, x,
    )
    assert abs(gb - gx) / max(abs(gx), 1.0) < BF16W_TRAIN_GRAD_RTOL

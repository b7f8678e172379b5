"""Custom VJPs (Pallas forward / XLA backward) vs jax.grad of the jnp ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.kernels import vjp
from winograd_tpu.ops import jnp_ops


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.5


def _grads(fn, args):
    loss = lambda *a: jnp.sum(fn(*a) ** 2)
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


@pytest.mark.parametrize("relu", [True, False])
def test_pointwise_grads_match(relu):
    x, w = _rand(0, 14, 14, 128), _rand(1, 128, 128)
    s, b = _rand(2, 128), _rand(3, 128)
    got = _grads(lambda *a: vjp.conv1x1_bn_train(*a, relu), (x, w, s, b))
    want = _grads(lambda *a: jnp_ops.conv1x1_bn(*a, relu), (x, w, s, b))
    for g, w_, name in zip(got, want, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=2e-3, err_msg=name)


@pytest.mark.parametrize("relu", [True, False])
def test_winograd_grads_match(relu):
    x, w = _rand(0, 14, 14, 128), _rand(1, 128, 128, 3, 3)
    s, b = _rand(2, 128), _rand(3, 128)
    got = _grads(lambda *a: vjp.conv3x3_bn_winograd_train(*a, relu, 4), (x, w, s, b))
    want = _grads(lambda *a: jnp_ops.conv3x3_bn_relu(*a, relu), (x, w, s, b))
    for g, w_, name in zip(got, want, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=5e-3, err_msg=name)


def test_forward_values_match_pallas():
    x, w = _rand(0, 14, 14, 128), _rand(1, 128, 128, 3, 3)
    s, b = _rand(2, 128), _rand(3, 128)
    out = vjp.conv3x3_bn_winograd_train(x, w, s, b, True, 4)
    want = jnp_ops.conv3x3_bn_relu(x, w, s, b, True)
    # Both sides are f32 approximations (pallas-winograd vs XLA direct conv);
    # their mutual difference can exceed the 1e-4 golden-parity bar slightly.
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=1e-3)


def test_stem_train_fused_matches_xla_autodiff():
    """stem_train_fused: forward == the served fused stem kernel; grads
    (input, raw OIHW filter, folded BN) == jax.grad of the XLA stem math."""
    from winograd_tpu.kernels.stem import stem_fused_pallas
    from winograd_tpu.kernels.vjp import stem_filter_s2d_jnp

    x = _rand(0, 32, 32, 3)
    params = {
        "w7_stem": _rand(1, 16, 3, 7, 7),
        "s_stem": _rand(2, 16) * 0.2 + 1.0,
        "b_stem": _rand(3, 16),
    }
    out = vjp.stem_train_fused(x, params)
    want_fwd = stem_fused_pallas(
        x, stem_filter_s2d_jnp(params["w7_stem"]),
        params["s_stem"], params["b_stem"],
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want_fwd))

    def _xla_stem(x_, p_):
        h = jnp_ops.conv7x7_s2_bn_relu(x_, p_["w7_stem"], p_["s_stem"], p_["b_stem"])
        return jnp_ops.maxpool3x3_s2(h)

    got = _grads(vjp.stem_train_fused, (x, params))
    want = _grads(_xla_stem, (x, params))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-4, atol=2e-3, err_msg="dx")
    for k in params:
        np.testing.assert_allclose(np.asarray(got[1][k]), np.asarray(want[1][k]),
                                   rtol=2e-4, atol=5e-3, err_msg=k)


def test_block_megakernel_grads_match_xla_autodiff():
    """bottleneck_block_train (fused megakernel forward) grads == jax.grad
    of the XLA block, for every param and the input."""
    from winograd_tpu.models.resnet import bottleneck_block_train, init_bottleneck_params

    params = init_bottleneck_params(0, c_io=64, c_mid=32)
    params.pop("u_mid")
    params.pop("w9_mid")
    x = _rand(4, 14, 14, 64)

    def loss_fused(x_, p_):
        return jnp.sum(bottleneck_block_train(x_, p_) ** 2)

    def loss_xla(x_, p_):
        return jnp.sum(jnp_ops.bottleneck_block(x_, p_) ** 2)

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    wx, wp = jax.grad(loss_xla, argnums=(0, 1))(x, params)
    # The backward is IDENTICAL math (XLA autodiff); residual differences
    # come only from the fused-vs-XLA forward feeding the loss cotangent
    # (~1e-5 relative), same tolerance tier as the per-layer VJP tests.
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=2e-4, atol=5e-3)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(wp[k]), rtol=2e-4, atol=5e-3, err_msg=k
        )


def test_block_megakernel_forward_is_the_serving_kernel():
    """The trained forward equals the served (megakernel) forward bit-for-
    bit-ish: both run kernels/block.py."""
    from winograd_tpu.kernels.block import bottleneck_block_fused_pallas
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.models.resnet import bottleneck_block_train, init_bottleneck_params

    params = init_bottleneck_params(1, c_io=64, c_mid=32)
    params.pop("u_mid")
    params.pop("w9_mid")
    x = _rand(5, 14, 14, 64)
    got = bottleneck_block_train(x, params)
    kp = dict(params)
    kp["w9_mid"] = direct_filter(params["w_mid"])
    want = bottleneck_block_fused_pallas(x, kp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_transition_megakernel_grads_match_xla_autodiff():
    """transition_block_train_fused (fused stride-2 megakernel forward)
    grads == jax.grad of the XLA downsample block."""
    from winograd_tpu.config import TransitionConfig
    from winograd_tpu.datagen.generate import make_transition_case, transition_params

    tcfg = TransitionConfig("t", 64, 32, 128, hw=14)
    tcase = make_transition_case(tcfg, seed=7)
    params = transition_params(tcase)
    params.pop("w9_mid")  # training carries the raw w_mid only
    params = {k: jnp.asarray(v) for k, v in params.items()}
    x = jnp.asarray(tcase["x"])

    def loss_fused(x_, p_):
        return jnp.sum(vjp.transition_block_train_fused(x_, p_) ** 2)

    def loss_xla(x_, p_):
        return jnp.sum(jnp_ops.downsample_bottleneck_block(x_, p_) ** 2)

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    wx, wp = jax.grad(loss_xla, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=2e-4, atol=5e-3)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(wp[k]), rtol=2e-4, atol=5e-3, err_msg=k
        )


def test_transition_train_forward_is_the_serving_kernel():
    from winograd_tpu.config import TransitionConfig
    from winograd_tpu.datagen.generate import make_transition_case, transition_params
    from winograd_tpu.kernels.transition import transition_block_fused_pallas

    tcfg = TransitionConfig("t", 64, 32, 128, hw=14)
    tcase = make_transition_case(tcfg, seed=8)
    params = transition_params(tcase)
    x = jnp.asarray(tcase["x"])
    train_params = {k: jnp.asarray(v) for k, v in params.items() if k != "w9_mid"}
    got = vjp.transition_block_train_fused(x, train_params)
    want = transition_block_fused_pallas(x, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_backbone_train_end_to_end():
    """resnet50_stages_train: one grad step through a 3-stage backbone
    (identity blocks + stride-2 transitions); the first stage's 32x32 maps
    take the weight-streaming stage-kernel train path (the >28x28 VMEM
    gate), the rest the block-megakernel VJPs; grads finite and matching
    the all-XLA autodiff."""
    from winograd_tpu.config import BackboneConfig
    from winograd_tpu.datagen.generate import backbone_stages, make_backbone_case
    from winograd_tpu.models.downsample import resnet50_stages_train

    class _Tiny(BackboneConfig):
        stages = ((32, 8, 32, 1), (64, 16, 14, 1), (128, 32, 7, 1))

    cfg = _Tiny("tiny")
    case = make_backbone_case(cfg, seed=3)
    stages = backbone_stages(cfg, case)
    # Strip derived artifacts: training parameterization is raw w_mid.
    stages = [
        {
            "transition": None
            if st["transition"] is None
            else {k: jnp.asarray(v) for k, v in st["transition"].items() if k != "w9_mid"},
            "blocks": [
                {
                    k: jnp.asarray(v)
                    for k, v in b.items()
                    if k not in ("w9_mid", "u_mid", "u2_mid")
                }
                for b in st["blocks"]
            ],
        }
        for st in stages
    ]
    x = jnp.asarray(case["x"])

    def xla_backbone(x_, stages_):
        for st in stages_:
            if st["transition"] is not None:
                x_ = jnp_ops.downsample_bottleneck_block(x_, st["transition"])
            for b in st["blocks"]:
                x_ = jnp_ops.bottleneck_block(x_, b)
        return x_

    loss_fused = lambda x_, s_: jnp.sum(resnet50_stages_train(x_, s_) ** 2)
    loss_xla = lambda x_, s_: jnp.sum(xla_backbone(x_, s_) ** 2)
    gx, gs = jax.grad(loss_fused, argnums=(0, 1))(x, stages)
    wx, ws = jax.grad(loss_xla, argnums=(0, 1))(x, stages)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=5e-4, atol=1e-2)
    for g, w_ in zip(jax.tree.leaves(gs), jax.tree.leaves(ws)):
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=5e-4, atol=1e-2)


@pytest.mark.parametrize("hw", [28, 8])
def test_stage_streamed_grads_match_xla_autodiff(hw):
    """resnet_stage_train_streamed (weight-streaming stage-kernel forward —
    the train path for the block megakernel's VMEM-gated geometries):
    grads == jax.grad of the XLA block chain, on BOTH mid routes (28x28
    auto-selects the F(2,3) winograd2 mid, 8x8 the direct im2col mid)."""
    from winograd_tpu.models.resnet import init_bottleneck_params

    blocks = []
    for i in range(2):
        p = init_bottleneck_params(10 + i, c_io=64, c_mid=16)
        p.pop("u_mid")
        p.pop("w9_mid")
        blocks.append(p)
    x = _rand(6, hw, hw, 64)

    def loss_fused(x_, bs_):
        return jnp.sum(vjp.resnet_stage_train_streamed(x_, bs_) ** 2)

    def loss_xla(x_, bs_):
        h = x_
        for p_ in bs_:
            h = jnp_ops.bottleneck_block(h, p_)
        return jnp.sum(h**2)

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    wx, wp = jax.grad(loss_xla, argnums=(0, 1))(x, blocks)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=2e-4, atol=5e-3)
    for bi, (g, w_) in enumerate(zip(gp, wp)):
        for k in g:
            np.testing.assert_allclose(
                np.asarray(g[k]), np.asarray(w_[k]),
                rtol=2e-4, atol=5e-3, err_msg=f"block{bi}/{k}",
            )


def test_stage_streamed_forward_is_the_serving_kernel():
    """The streamed train forward equals the served weight-streaming stage
    kernel exactly: both run kernels/stage.py on the same derived
    artifacts."""
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.kernels.stage import (
        resnet_stage_fused_pallas,
        stack_stage_params,
    )
    from winograd_tpu.models.resnet import init_bottleneck_params

    blocks = []
    for i in range(2):
        p = init_bottleneck_params(20 + i, c_io=64, c_mid=16)
        p.pop("u_mid")
        p.pop("w9_mid")
        blocks.append(p)
    x = _rand(7, 8, 8, 64)
    got = vjp.resnet_stage_train_streamed(x, blocks)
    kps = []
    for b in blocks:
        kp = dict(b)
        kp["w9_mid"] = direct_filter(b["w_mid"])
        kps.append(kp)
    want = resnet_stage_fused_pallas(x, stack_stage_params(kps))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_filter_transform_jnp_matches_numpy():
    from winograd_tpu.kernels import transforms

    w = np.asarray(_rand(5, 8, 4, 3, 3))
    got = np.asarray(vjp.filter_transform_jnp(jnp.asarray(w), m=4))
    want = transforms.transform_filter(w, m=4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_optimizer_loop_converges_through_megakernel():
    """A REAL training loop: optax Adam distilling a frozen random-teacher
    block into a student, forward = the serving block megakernel
    (bottleneck_block_train). Loss must fall by >10x — the end-to-end proof
    that the custom-VJP training path optimizes, beyond per-step grad
    parity."""
    import optax

    from winograd_tpu.models.resnet import (
        bottleneck_block_train,
        init_bottleneck_params,
    )

    teacher = init_bottleneck_params(0, c_io=64, c_mid=16)
    teacher = {
        k: jnp.asarray(v)
        for k, v in teacher.items()
        if k not in ("w9_mid", "u_mid", "u2_mid")
    }
    # Student starts near (not at) the teacher: the optimum is reachable,
    # so the bar below tests the OPTIMIZER path, not task expressibility.
    keys = jax.random.split(jax.random.PRNGKey(2), len(teacher))
    student = {
        k: v + 0.05 * jax.random.normal(kk, v.shape, v.dtype)
        for kk, (k, v) in zip(keys, sorted(teacher.items()))
    }
    x = jax.random.normal(jax.random.PRNGKey(7), (14, 14, 64), jnp.float32)
    target = bottleneck_block_train(x, teacher)

    opt = optax.adam(1e-2)
    opt_state = opt.init(student)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((bottleneck_block_train(x, p) - target) ** 2)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(150):
        student, opt_state, loss = step(student, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])


def test_recover_z_matches_remat_and_guards_zero_scale():
    """The backward's algebraic z recovery equals the rematerialized pre-BN
    activation wherever the ReLU-masked gradient can be nonzero, and the
    scale==0 guard keeps it finite."""
    from winograd_tpu.kernels.vjp import _recover_z

    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.standard_normal((4, 4, 8)).astype(np.float32))
    scale = jnp.asarray((rng.random(8) + 0.5).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.1)
    y = jnp.maximum(z * scale + bias, 0.0)
    zr = _recover_z(y, scale, bias)
    mask = np.asarray(y) > 0
    assert np.allclose(np.asarray(zr)[mask], np.asarray(z)[mask], atol=1e-6)
    # scale = 0 channel: recovery is junk there but must stay finite.
    s0 = scale.at[0].set(0.0)
    y0 = jnp.maximum(z * s0 + bias, 0.0)
    assert np.isfinite(np.asarray(_recover_z(y0, s0, bias))).all()

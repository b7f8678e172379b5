"""The COMPLETE ResNet-50 (mode 16): stem + projection block + 16-block
trunk + head, vs the float64 golden chain, at every serving tier.

The reference never composes its layers into a network (SURVEY.md §2); this
is the framework's whole-model deliverable — a 224x224x3 image to 1000
logits through the fused Pallas kernels.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from winograd_tpu.config import (
    BF16W_RTOL_BACKBONE,
    CASES,
    INT8_RTOL_BACKBONE,
    PARITY_ATOL,
    ResNet50Config,
)


def _rel(out, gold):
    return np.abs(np.asarray(out) - gold).max() / max(np.abs(gold).max(), 1.0)


@dataclasses.dataclass(frozen=True)
class _TinyR50(ResNet50Config):
    """Shape-generality config: same structure (stem, stride-1 projection
    entry, two stages with a stride-2 transition, head), toy sizes."""

    stages = ((64, 16, 8, 1), (128, 32, 4, 1))
    img: int = 32
    stem_c: int = 16
    num_classes: int = 24


def test_stem_matches_golden():
    from winograd_tpu.datagen.generate import _bn_params, _rand
    from winograd_tpu.models.resnet50 import (
        stem_filter,
        stem_filter_s2d,
        stem_pallas,
    )
    from winograd_tpu.ops import jnp_ops, reference

    rng = np.random.default_rng(0)
    x = _rand(rng, 32, 32, 3)
    w7 = _rand(rng, 16, 3, 7, 7)
    bn = _bn_params(rng, 16)
    gold = np.asarray(reference.stem(x, w7, bn["scale"], bn["bias"]), np.float32)
    params = {
        "w49_stem": jnp.asarray(stem_filter(w7)),
        "w7_stem": jnp.asarray(w7),
        "w192_stem": jnp.asarray(stem_filter_s2d(w7)),
        "s_stem": jnp.asarray(bn["scale"]),
        "b_stem": jnp.asarray(bn["bias"]),
    }
    out = np.asarray(stem_pallas(jnp.asarray(x), params))
    assert out.shape == (8, 8, 16)
    assert np.abs(out - gold).max() < PARITY_ATOL
    # The served default is the single fused kernel (kernels/stem.py);
    # check its accuracy tiers too.
    for prec, bound in (("bf16w", 5e-3), ("int8", 5e-2)):
        out_t = np.asarray(stem_pallas(jnp.asarray(x), params, precision=prec))
        rel = np.abs(out_t - gold).max() / max(np.abs(gold).max(), 1.0)
        assert rel < bound, (prec, rel)
    # The space-to-depth patch-matrix route (the previous served path).
    out_s2d = np.asarray(stem_pallas(jnp.asarray(x), params, algo="s2d"))
    assert np.abs(out_s2d - gold).max() < PARITY_ATOL
    # The explicit im2col + fused-Pallas-GEMM route (kept as the non-XLA
    # differential path; see resnet50.py docstring for why it isn't served).
    out_im2col = np.asarray(stem_pallas(jnp.asarray(x), params, algo="im2col"))
    assert np.abs(out_im2col - gold).max() < PARITY_ATOL
    out_xla = np.asarray(jnp_ops.stem(jnp.asarray(x), params))
    assert np.abs(out_xla - gold).max() < PARITY_ATOL
    # The preprocessed-input contract: stem_prepare_input on the host side
    # + stem_pallas_pre on the device side == the fused route exactly.
    from winograd_tpu.kernels.stem import stem_prepare_input
    from winograd_tpu.models.resnet50 import stem_pallas_pre

    xpre = stem_prepare_input(jnp.asarray(x))
    out_pre = np.asarray(stem_pallas_pre(xpre, params, h=32, w=32))[0]
    np.testing.assert_array_equal(out_pre, out)
    # Batched.
    xb = np.stack([x, 0.5 * x])
    outb = np.asarray(stem_pallas(jnp.asarray(xb), params))
    assert outb.shape == (2, 8, 8, 16)
    assert np.abs(outb[0] - gold).max() < PARITY_ATOL
    outb_s2d = np.asarray(stem_pallas(jnp.asarray(xb), params, algo="s2d"))
    assert outb_s2d.shape == (2, 8, 8, 16)
    assert np.abs(outb_s2d[0] - gold).max() < PARITY_ATOL
    assert np.abs(outb_s2d[1] - np.asarray(
        stem_pallas(jnp.asarray(0.5 * x), params, algo="s2d"))).max() < PARITY_ATOL


def test_stem_odd_map_matches_golden():
    """img = 2 mod 4 (odd conv output, odd pool input): ceil-style output
    sizing on every route, matching the golden — floor-style XLA padding
    silently dropped the last pooled row/col here (caught in round-3
    review; all shipped configs happen to be even)."""
    from winograd_tpu.datagen.generate import _bn_params, _rand
    from winograd_tpu.models.resnet50 import (
        stem_filter,
        stem_filter_s2d,
        stem_pallas,
    )
    from winograd_tpu.ops import jnp_ops, reference

    rng = np.random.default_rng(4)
    x = _rand(rng, 30, 30, 3)
    w7 = _rand(rng, 16, 3, 7, 7)
    bn = _bn_params(rng, 16)
    gold = np.asarray(reference.stem(x, w7, bn["scale"], bn["bias"]), np.float32)
    assert gold.shape == (8, 8, 16)
    params = {
        "w49_stem": jnp.asarray(stem_filter(w7)),
        "w7_stem": jnp.asarray(w7),
        "w192_stem": jnp.asarray(stem_filter_s2d(w7)),
        "s_stem": jnp.asarray(bn["scale"]),
        "b_stem": jnp.asarray(bn["bias"]),
    }
    for algo in ("fused", "s2d", "conv", "im2col"):
        out = np.asarray(stem_pallas(jnp.asarray(x), params, algo=algo))
        assert out.shape == gold.shape, (algo, out.shape)
        assert np.abs(out - gold).max() < PARITY_ATOL, algo
    out_xla = np.asarray(jnp_ops.stem(jnp.asarray(x), params))
    assert out_xla.shape == gold.shape
    assert np.abs(out_xla - gold).max() < PARITY_ATOL


def test_head_matches_golden_with_class_padding():
    """num_classes=1000 is not lane-aligned; the head pads to 1024 and
    slices back."""
    from winograd_tpu.datagen.generate import _rand
    from winograd_tpu.models.resnet50 import head_pallas
    from winograd_tpu.ops import jnp_ops, reference

    rng = np.random.default_rng(1)
    x = _rand(rng, 7, 7, 256)
    w_fc = _rand(rng, 256, 1000, scale=0.1)
    b_fc = _rand(rng, 1000)
    gold = np.asarray(reference.head(x, w_fc, b_fc), np.float32)
    params = {"w_fc": jnp.asarray(w_fc), "b_fc": jnp.asarray(b_fc)}
    out = np.asarray(head_pallas(jnp.asarray(x), params))
    assert out.shape == (1000,)
    assert np.abs(out - gold).max() < PARITY_ATOL
    out_xla = np.asarray(jnp_ops.head(jnp.asarray(x), params))
    assert np.abs(out_xla - gold).max() < PARITY_ATOL


def test_projection_block_stride1():
    """conv2_x's entry block: channels change (16->64), resolution doesn't,
    1x1 projection shortcut — golden stride=1 variant."""
    from winograd_tpu.config import TransitionConfig
    from winograd_tpu.datagen.generate import _transition_params_random
    from winograd_tpu.kernels import transforms
    from winograd_tpu.models.downsample import projection_bottleneck_block_pallas
    from winograd_tpu.ops import jnp_ops, reference

    rng = np.random.default_rng(2)
    pcfg = TransitionConfig("p", 16, 16, 64, hw=8)
    p = _transition_params_random(rng, pcfg)
    p["u2_mid"] = transforms.transform_filter(p["w_mid"], m=2)
    x = ((rng.random((8, 8, 16)) - 0.5)).astype(np.float32)
    gold = reference.downsample_bottleneck_block(
        x,
        p["w_reduce"], p["s_reduce"], p["b_reduce"],
        p["w_mid"], p["s_mid"], p["b_mid"],
        p["w_expand"], p["s_expand"], p["b_expand"],
        p["w_proj"], p["s_proj"], p["b_proj"],
        stride=1,
    )
    out = np.asarray(projection_bottleneck_block_pallas(jnp.asarray(x), p))
    assert out.shape == (8, 8, 64)
    assert np.abs(out - gold).max() < PARITY_ATOL
    out_xla = np.asarray(jnp_ops.downsample_bottleneck_block(jnp.asarray(x), p, stride=1))
    assert np.abs(out_xla - gold).max() < PARITY_ATOL


def test_tiny_resnet50_all_tiers():
    """End-to-end tiny full model: f32 Pallas, XLA baseline, bf16w, int8 —
    all against the float64 golden logits."""
    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models.resnet50 import (
        quantize_resnet50,
        resnet50_forward_int8,
        resnet50_forward_pallas,
        resnet50_forward_xla,
        resnet50_params,
    )

    cfg = _TinyR50("tiny_resnet50")
    case = make_resnet50_case(cfg, seed=7)
    params = resnet50_params(case, cfg)
    x = jnp.asarray(case["x"])
    gold = case["golden"]
    assert gold.shape == (cfg.num_classes,)

    out = np.asarray(resnet50_forward_pallas(x, params))
    assert np.abs(out - gold).max() < 10 * PARITY_ATOL

    out_xla = np.asarray(resnet50_forward_xla(x, params))
    assert np.abs(out_xla - gold).max() < 10 * PARITY_ATOL

    out_bf = np.asarray(resnet50_forward_pallas(x, params, precision="bf16w"))
    assert _rel(out_bf, gold) < BF16W_RTOL_BACKBONE

    qparams = quantize_resnet50(params)
    out_i8 = np.asarray(resnet50_forward_int8(x, qparams))
    assert _rel(out_i8, gold) < INT8_RTOL_BACKBONE

    # Preprocessed-input contract: prepare on the "host", forward from the
    # prepared operand — identical logits to the raw-image route.
    from winograd_tpu.kernels.stem import stem_prepare_input
    from winograd_tpu.models.resnet50 import resnet50_forward_pre

    xpre = stem_prepare_input(x)
    out_pre = np.asarray(
        resnet50_forward_pre(xpre, params, h=cfg.img, w=cfg.img)
    ).reshape(gold.shape)
    np.testing.assert_array_equal(out_pre, out)


def test_chunked_batch_serving_matches_single():
    """Batches beyond SERVE_CHUNK route through the lax.map chunk loop
    (the N=32 scoped-VMEM compile workaround, models/resnet50.py::
    _map_batch_chunks) — logits must equal the per-image forward exactly
    on every tier, and non-divisible / small batches must stay on the
    native path."""
    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models.resnet50 import (
        SERVE_CHUNK,
        quantize_resnet50,
        resnet50_forward_int8,
        resnet50_forward_pallas,
        resnet50_params,
    )

    cfg = _TinyR50("tiny_resnet50_chunk")
    case = make_resnet50_case(cfg, seed=13)
    params = resnet50_params(case, cfg)
    rng = np.random.default_rng(13)
    n = 2 * SERVE_CHUNK
    xb = jnp.asarray(
        rng.standard_normal((n, cfg.img, cfg.img, 3)).astype(np.float32)
    )

    # Chunked == the composition of native chunk-size calls at one-ulp
    # tolerance (XLA fuses the lax.map body in its own context, so bitwise
    # equality across compiles is not guaranteed), and == per-image at f32
    # tolerance (a lone image tiles the head GEMM differently).
    chunked = np.asarray(resnet50_forward_pallas(xb, params))
    native = np.concatenate(
        [
            np.asarray(resnet50_forward_pallas(xb[k : k + SERVE_CHUNK], params))
            for k in range(0, n, SERVE_CHUNK)
        ]
    )
    np.testing.assert_allclose(chunked, native, atol=1e-6)
    per = np.stack(
        [np.asarray(resnet50_forward_pallas(xb[i], params)) for i in range(n)]
    )
    np.testing.assert_allclose(chunked, per, atol=1e-5)

    qparams = quantize_resnet50(params)
    chunked_i8 = np.asarray(resnet50_forward_int8(xb, qparams))
    native_i8 = np.concatenate(
        [
            np.asarray(resnet50_forward_int8(xb[k : k + SERVE_CHUNK], qparams))
            for k in range(0, n, SERVE_CHUNK)
        ]
    )
    np.testing.assert_allclose(chunked_i8, native_i8, atol=1e-5)

    # A batch that doesn't divide the chunk stays on the native path.
    odd = np.asarray(resnet50_forward_pallas(xb[: SERVE_CHUNK + 1], params))
    np.testing.assert_allclose(odd, per[: SERVE_CHUNK + 1], atol=1e-5)


def test_tiny_resnet50_train_step():
    """Mode 19's subject at toy scale: the full-classifier training forward
    (every conv through the fused kernels, offline layouts derived
    in-trace) matches the golden logits, and a whole train step's
    loss+grad-norm scalar agrees with the all-XLA autodiff step."""
    import jax

    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models.resnet50 import (
        resnet50_forward_train,
        resnet50_forward_xla,
        resnet50_params,
    )

    cfg = _TinyR50("tiny_resnet50_train")
    case = make_resnet50_case(cfg, seed=9)
    full = resnet50_params(case, cfg)
    drop = ("u_mid", "u2_mid", "w9_mid", "w49_stem", "w192_stem")

    def _trainable(d):
        return {k: jnp.asarray(v) for k, v in d.items() if k not in drop}

    params = {
        "stem": _trainable(full["stem"]),
        "proj": _trainable(full["proj"]),
        "stages": [
            {
                "transition": None
                if st["transition"] is None
                else _trainable(st["transition"]),
                "blocks": [_trainable(b) for b in st["blocks"]],
            }
            for st in full["stages"]
        ],
        "head": _trainable(full["head"]),
    }
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


def test_tiny_resnet50_training_converges():
    """Real training loop on the tiny classifier: softmax cross-entropy,
    SGD+momentum (models/train.py), loss decreases — then the trained
    params deploy through the checkpoint pipeline and still classify."""
    import jax

    from winograd_tpu.models.checkpoint import prepare_resnet50_serving
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.models.train import (
        make_resnet50_train_step,
        trainable_resnet50_params,
    )

    cfg = _TinyR50("tiny_resnet50_sgd")
    params = trainable_resnet50_params(init_resnet50_params(cfg, seed=5))
    momentum = jax.tree.map(jnp.zeros_like, params)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    labels = jnp.asarray([3, 17])
    step = make_resnet50_train_step(lr=5e-3)
    losses = []
    for _ in range(6):
        params, momentum, loss = step(params, momentum, x, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # Deploy the trained params and check they serve (same logits as the
    # serving forward given the derived artifacts).
    serving = prepare_resnet50_serving(jax.tree.map(np.asarray, params))
    logits = np.asarray(resnet50_forward_pallas(x[0], serving))
    assert logits.shape == (cfg.num_classes,) and np.isfinite(logits).all()


def test_tiny_resnet50_train_step_dp_mesh_matches_single():
    """The DP-sharded full-classifier train step (8-device mesh, batch
    sharded, grads pmean'd) reproduces the single-device step exactly."""
    import jax

    from winograd_tpu.models.resnet50 import init_resnet50_params
    from winograd_tpu.models.train import (
        make_resnet50_train_step,
        trainable_resnet50_params,
    )
    from winograd_tpu.parallel import make_mesh

    cfg = _TinyR50("tiny_resnet50_dp")
    params = trainable_resnet50_params(init_resnet50_params(cfg, seed=6))
    momentum = jax.tree.map(jnp.zeros_like, params)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3), jnp.float32)
    labels = jnp.arange(8) % cfg.num_classes

    p1, m1, l1 = make_resnet50_train_step(lr=1e-2)(params, momentum, x, labels)
    mesh = make_mesh(8, model_axis=1)
    p8, m8, l8 = make_resnet50_train_step(lr=1e-2, mesh=mesh)(
        params, momentum, x, labels
    )
    assert abs(float(l1) - float(l8)) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_full_resnet50_mode16():
    """Bench mode 16 at real shape: 224x224x3 -> 1000 logits through the
    serving kernels, trunk AND logits against the float64 golden chain."""
    from winograd_tpu.datagen.generate import make_case
    from winograd_tpu.models.resnet50 import resnet50_forward_pallas, resnet50_params

    cfg = CASES[16]
    case = make_case(16, seed=16)
    params = resnet50_params(case, cfg)
    out = np.asarray(resnet50_forward_pallas(jnp.asarray(case["x"]), params))
    assert out.shape == (1000,)
    err = np.abs(out - case["golden"]).max()
    assert err < 10 * PARITY_ATOL, err

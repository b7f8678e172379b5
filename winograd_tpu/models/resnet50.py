"""The COMPLETE ResNet-50 image classifier — stem + 16-block trunk + head.

The reference scopes to single fused layers of one bottleneck stage
(/root/reference/report.pdf section 1: "single example inference...the 14x14
stage"); the composed trunk (bench modes 13-15) already goes beyond it.
This module closes the model: a 224x224x3 image in, 1000 logits out, every
conv through the framework's fused Pallas kernels, all three serving tiers.

TPU-first structure:
* Stem 7x7/2 conv (served route, `algo="s2d"`): space-to-depth by the
  stride (factor 2, so every output position keeps one cell phase), then
  the 4x4 cell neighborhood concatenated into a (112, 112, 192) patch
  matrix — 16 CONTIGUOUS XLA slices instead of im2col's 49 strided ones —
  into the SAME fused GEMM+BN+ReLU Pallas kernel the 1x1 layers use, then
  the 3x3/2 maxpool. Measured v5e (224x224x3): 109.5 us at 5.6e-6 vs the
  float64 golden — 3.4x faster than the best strict-parity alternative,
  XLA's conv emitter at HIGHEST (375.8 us). The relayout is 61 us of that;
  the other routes are measured dead ends kept for differential checks:
  `algo="conv"` (the emitter; precision ladder + the split-operand failure
  in jnp_ops.conv7x7_s2_bn_relu's docstring) and `algo="im2col"` (3323 us
  — the 49-slice channel-minor concat with C=3 is pathological).
* conv2_x entry: the stride-1 PROJECTION bottleneck
  (models/downsample.py::projection_bottleneck_block_pallas).
* Trunk: models/downsample.py::resnet50_stages — the stage/transition
  megakernels (modes 13-15's serving path).
* Head: global avgpool (one VPU reduction) + the FC through the fused
  pointwise kernel, classes padded to a lane-aligned 1024 and sliced back.

Tiers: f32 (strict 1e-4 parity on logits), bf16w (bf16 weight storage
end to end — the head FC alone streams 8 MB/image at f32), int8 (all
GEMMs int8 except the stem conv, whose 37 KB of weights cannot pay for
quantizing the 8-bit-scale image input path).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.models.downsample import (
    projection_bottleneck_block_pallas,
    resnet50_stages,
    resnet50_stages_int8,
)
from winograd_tpu.ops import jnp_ops


def stem_filter(w7: np.ndarray) -> np.ndarray:
    """(Cout, Cin, 7, 7) OIHW -> (49*Cin, Cout) im2col GEMM layout
    (row index = (7r + s) * Cin + c, matching _stem_im2col's columns)."""
    cout, cin = w7.shape[0], w7.shape[1]
    return np.transpose(np.asarray(w7), (2, 3, 1, 0)).reshape(49 * cin, cout)


def stem_filter_s2d(w7: np.ndarray) -> np.ndarray:
    """(Cout, Cin, 7, 7) OIHW -> (16*4*Cin, Cout) GEMM layout for the
    space-to-depth stem route (_stem_s2d_cols' column order: cell offset
    (a, b) in 0..3, intra-cell (u, v) in 0..1, channel c; tap
    (r, s) = (2a+u, 2b+v), zero where r or s > 6)."""
    cout, cin = w7.shape[0], w7.shape[1]
    wt = np.transpose(np.asarray(w7, np.float32), (2, 3, 1, 0))  # (7,7,cin,cout)
    out = np.zeros((64 * cin, cout), np.float32)
    for a in range(4):
        for b in range(4):
            for u in range(2):
                for v in range(2):
                    r, s = 2 * a + u, 2 * b + v
                    if r < 7 and s < 7:
                        i = ((a * 4 + b) * 4 + u * 2 + v) * cin
                        out[i : i + cin] = wt[r, s]
    return out


def _stem_s2d_cols(x: jax.Array, dtype=None) -> jax.Array:
    """(..., H, W, C) -> (..., ceil(H/2), ceil(W/2), 64*C): the stride-2 7x7
    patch matrix via space-to-depth. Pad 3 (the conv's sampling), s2d by the
    stride (factor 2 = stride 2, so every output position has the SAME cell
    phase), then concatenate the 4x4 cell neighborhood — 16 contiguous
    slices instead of im2col's 49 strided ones, and every slice has 4C
    channels instead of C. One XLA relayout of 16x the input bytes;
    dtype=bfloat16 halves them (the int8-tier stem)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if dtype is not None:
        x = x.astype(dtype)
    n, h, w, c = x.shape
    ho, wo = -(-h // 2), -(-w // 2)
    hp, wp = 2 * (ho + 3), 2 * (wo + 3)
    xp = jnp.pad(x, ((0, 0), (3, hp - 3 - h), (3, wp - 3 - w), (0, 0)))
    s2d = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    cols = [
        s2d[:, a : a + ho, b : b + wo, :] for a in range(4) for b in range(4)
    ]
    out = jnp.concatenate(cols, axis=-1)
    return out[0] if squeeze else out


def _stem_im2col(x: jax.Array) -> jax.Array:
    """(..., H, W, C) -> (..., ceil(H/2), ceil(W/2), 49*C): stride-2 7x7
    patches at pad 3 (the golden model's conv7x7_stride2 sampling)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    ho, wo = -(-h // 2), -(-w // 2)
    xp = jnp.pad(x, ((0, 0), (3, 2 * ho + 2 - h), (3, 2 * wo + 2 - w), (0, 0)))
    cols = [
        xp[:, r : r + 2 * ho - 1 : 2, s : s + 2 * wo - 1 : 2, :]
        for r in range(7)
        for s in range(7)
    ]
    out = jnp.concatenate(cols, axis=-1)
    return out[0] if squeeze else out


def stem_pallas(
    x: jax.Array,
    params: Dict,
    precision: str | None = None,
    algo: str = "fused",
) -> jax.Array:
    """Stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool.
    (..., 224, 224, 3) -> (..., 56, 56, 64).

    algo="fused" (default, the served route) runs the whole stem as ONE
    Pallas kernel — s2d patch GEMMs + BN + ReLU + row-pooled maxpool in
    VMEM (kernels/stem.py) — needing only the cheap 4x width-shift XLA
    relayout instead of the 16x patch matrix; needs key w192_stem
    (192, 64) = stem_filter_s2d(w7).
    algo="s2d" is the previous served route (the full XLA-built patch
    matrix through the fused pointwise kernel); same w192_stem key.
    algo="conv" runs XLA's conv emitter at the tier's precision
    (jnp_ops.conv7x7_s2_bn_relu: f32 -> HIGHEST exact, bf16w -> HIGH
    2.07e-4, int8 -> DEFAULT 3.1e-3); needs w7_stem (64, 3, 7, 7) OIHW.
    algo="im2col" routes the strided im2col into the same pointwise kernel
    (differential check only); needs w49_stem (147, 64).
    Common keys: s_stem, b_stem."""
    if algo == "fused":
        from winograd_tpu.kernels.stem import stem_fused_pallas

        prec = {None: "bf16x3", "bf16w": "bf16w", "int8": "bf16"}[precision]
        return stem_fused_pallas(
            x, params["w192_stem"], params["s_stem"], params["b_stem"],
            precision=prec,
        )
    if algo == "conv":
        h = jnp_ops.conv7x7_s2_bn_relu(
            x, params["w7_stem"], params["s_stem"], params["b_stem"],
            precision=precision,
        )
        return jnp_ops.maxpool3x3_s2(h)
    if algo == "s2d":
        # Space-to-depth patch matrix -> ONE fused Pallas GEMM. The tier
        # maps onto split_dot pass counts (kernels/direct.py): 3-pass
        # bf16x3 holds the strict 1e-4 bar; the int8-tier stem builds the
        # patch matrix IN bfloat16 (half the relayout+stream bytes) and
        # runs one fully-bf16 pass (the stem's 37 KB of weights aren't
        # worth int8 quantizing — its cost is the activation relayout).
        gemm_prec = {None: "bf16x3", "bf16w": "bf16w", "int8": "bf16"}[precision]
        cols = _stem_s2d_cols(
            x, dtype=jnp.bfloat16 if precision == "int8" else None
        )
        h = conv1x1_bn_pallas(
            cols, params["w192_stem"], params["s_stem"], params["b_stem"],
            relu=True, precision=gemm_prec,
        )
        return jnp_ops.maxpool3x3_s2(h)
    assert algo == "im2col", algo
    kw = {} if precision is None else {"precision": precision}
    cols = _stem_im2col(x)
    h = conv1x1_bn_pallas(
        cols, params["w49_stem"], params["s_stem"], params["b_stem"], relu=True, **kw
    )
    return jnp_ops.maxpool3x3_s2(h)


def _class_pad(nc: int) -> int:
    """Padding that lane-aligns the FC's class dim to a multiple of 128
    for the MXU (callers slice the logits back to nc)."""
    return -(-nc // 128) * 128 - nc


def head_pallas(
    x: jax.Array, params: Dict, precision: str | None = None, gemm=None
) -> jax.Array:
    """Head: global avgpool + FC through the fused pointwise kernel
    (classes lane-padded via _class_pad and sliced back). Keys: w_fc
    (C, num_classes), b_fc (num_classes,). `gemm` overrides the kernel —
    resnet50_forward_train passes the differentiable conv1x1_bn_train."""
    kw = {} if precision is None else {"precision": precision}
    if gemm is None:
        gemm = lambda p, w, s, b: conv1x1_bn_pallas(p, w, s, b, relu=False, **kw)
    pooled = jnp.mean(x, axis=(-3, -2))
    w_fc, b_fc = params["w_fc"], params["b_fc"]
    nc = w_fc.shape[1]
    pad = _class_pad(nc)
    if pad:
        w_fc = jnp.pad(w_fc, ((0, 0), (0, pad)))
        b_fc = jnp.pad(b_fc, ((0, pad),))
    logits = gemm(pooled, w_fc, jnp.ones((nc + pad,), jnp.float32), b_fc)
    return logits[..., :nc]


SERVE_CHUNK = 8


def _map_batch_chunks(fn, x: jax.Array, chunk: int = SERVE_CHUNK) -> jax.Array:
    """Serve large batches in CHUNK-image slices via one lax.map loop.

    A TPU compile workaround, not memory microbatching: inside a while-loop
    body (the bench's timing scan; any pipelining loop a deployment wraps
    the step in) XLA's memory-space assignment stack-allocates a Pallas
    call's output in scoped VMEM when consecutive custom calls chain — and
    at batch 32 the conv2_x activation (32,56,56,256) is 98 MiB, which it
    attempts anyway and the compile dies ("It should not be possible to run
    out of scoped vmem", v5e, observed 2026-08-20; plain jit of the same
    graph compiles fine). Chunked at 8, every intermediate matches the
    proven batch-8 regime (<= 24.5 MiB — placement succeeds and keeps the
    chain in VMEM). Device arithmetic is identical: all these kernels are
    image-outer grids, so weights re-stream per image either way and the
    map adds only one loop counter."""
    n = x.shape[0]
    assert n > chunk and n % chunk == 0, (n, chunk)  # callers gate on this
    xs = x.reshape(n // chunk, chunk, *x.shape[1:])
    out = jax.lax.map(fn, xs)
    return out.reshape(n, *out.shape[2:])


def resnet50_forward_pallas(
    x: jax.Array, params: Dict, precision: str | None = None
) -> jax.Array:
    """Full ResNet-50 forward through the fused Pallas kernels.

    params: {"stem": ..., "proj": conv2_x entry block, "stages": the
    resnet50_stages structure, "head": ...}. precision=None is the f32
    tier; "bf16w" streams bfloat16 weights end to end. Batches beyond
    SERVE_CHUNK run as chunked lax.map slices (_map_batch_chunks)."""
    if x.ndim == 4 and x.shape[0] > SERVE_CHUNK and x.shape[0] % SERVE_CHUNK == 0:
        return _map_batch_chunks(
            lambda c: resnet50_forward_pallas(c, params, precision), x
        )
    h = stem_pallas(x, params["stem"], precision)
    h = projection_bottleneck_block_pallas(h, params["proj"], precision)
    h = resnet50_stages(h, params["stages"], precision=precision)
    return head_pallas(h, params["head"], precision)


def stem_pallas_pre(
    xb: jax.Array, params: Dict, precision: str | None = None,
    *, h: int = 224, w: int = 224,
) -> jax.Array:
    """The stem on a PREPARED input operand (kernels/stem.py::
    stem_prepare_input) — the preprocessed-input serving contract: the
    host input pipeline pays the layout once, the device never pays the
    ~50-65 us s2d/concat gather relayout. The offline-transform philosophy
    (reference data_generator.py:63-78) applied to the input side."""
    from winograd_tpu.kernels.stem import stem_fused_pallas_pre

    prec = {None: "bf16x3", "bf16w": "bf16w", "int8": "bf16"}[precision]
    return stem_fused_pallas_pre(
        xb, params["w192_stem"], params["s_stem"], params["b_stem"],
        h=h, w=w, precision=prec,
    )


def resnet50_forward_pre(
    xb: jax.Array, params: Dict, precision: str | None = None,
    *, h: int = 224, w: int = 224,
) -> jax.Array:
    """Full ResNet-50 forward from a PREPARED stem operand (the
    preprocessed-input contract; see stem_pallas_pre). Everything after
    the stem is identical to resnet50_forward_pallas, including the
    chunked-batch serving loop."""
    if xb.ndim == 4 and xb.shape[0] > SERVE_CHUNK and xb.shape[0] % SERVE_CHUNK == 0:
        return _map_batch_chunks(
            lambda c: resnet50_forward_pre(c, params, precision, h=h, w=w),
            xb,
        )
    hh = stem_pallas_pre(xb, params["stem"], precision, h=h, w=w)
    hh = projection_bottleneck_block_pallas(hh, params["proj"], precision)
    hh = resnet50_stages(hh, params["stages"], precision=precision)
    return head_pallas(hh, params["head"], precision)


def resnet50_forward_train(
    x: jax.Array, params: Dict, precision: str | None = None
) -> jax.Array:
    """Differentiable COMPLETE-classifier forward whose every conv runs the
    SAME fused Pallas kernels serving uses (mode 19's subject): the fused
    stem kernel via stem_train_fused (w7 -> w192 layout derived in-trace so
    gradients flow to the raw OIHW filter), the projection / block /
    transition custom VJPs, and the head FC. Backward passes are XLA
    autodiff of the identical math, rematerialized (kernels/vjp.py).

    params carries the TRAINABLE set only: stem {w7_stem, s_stem, b_stem},
    proj/stages with raw w_mid (no offline layouts), head {w_fc, b_fc}.

    precision="bf16w" is the bf16 weight-STORAGE training tier: the f32
    master params stay the trainable leaves, the forward streams bf16
    weight copies through the exact bf16w serving kernels (half the HBM
    weight bytes of the step's dominant pass), the backward stays the
    f32/HIGH rematerializing math. Gradients stay within
    BF16W_TRAIN_GRAD_RTOL of the f32 step (config.py)."""
    from winograd_tpu.kernels.vjp import (
        conv1x1_bn_train,
        projection_block_train_fused,
        stem_train_fused,
    )
    from winograd_tpu.models.downsample import resnet50_stages_train

    h = stem_train_fused(x, params["stem"], precision)
    h = projection_block_train_fused(h, params["proj"], precision)
    h = resnet50_stages_train(h, params["stages"], precision)
    return head_pallas(
        h,
        params["head"],
        gemm=lambda p, w, s, b: conv1x1_bn_train(p, w, s, b, False, precision),
    )


def resnet50_forward_xla(x: jax.Array, params: Dict) -> jax.Array:
    """The same network through jitted XLA ops (the vendor-baseline role)."""
    h = jnp_ops.stem(x, params["stem"])
    h = jnp_ops.downsample_bottleneck_block(h, params["proj"], stride=1)
    for stage in params["stages"]:
        if stage.get("transition") is not None:
            h = jnp_ops.downsample_bottleneck_block(h, stage["transition"])
        for b in stage["blocks"]:
            h = jnp_ops.bottleneck_block(h, b)
    return jnp_ops.head(h, params["head"])


def quantize_resnet50(params: Dict) -> Dict:
    """Offline int8 quantization of the full model. The stem stays f32
    (37 KB of weights; quantizing the image input path saves nothing);
    the projection block, the 16-block trunk, and the head FC go int8."""
    from winograd_tpu.kernels.quantized import (
        quantize_transition_params,
        quantize_weights,
    )
    from winograd_tpu.models.downsample import quantize_backbone

    wq, sw = quantize_weights(np.asarray(params["head"]["w_fc"]))
    return {
        "stem": params["stem"],
        "proj": quantize_transition_params(params["proj"]),
        "stages": quantize_backbone(params["stages"]),
        "head": {
            "w_fc_q": jnp.asarray(wq),
            "w_fc_s": jnp.asarray(sw),
            "b_fc": jnp.asarray(params["head"]["b_fc"], jnp.float32),
        },
    }


def _projection_block_int8(x: jax.Array, q: Dict) -> jax.Array:
    """Stride-1 projection bottleneck at the int8 tier, composed from the
    quantized per-layer kernels (quantize_transition_params layout)."""
    from winograd_tpu.kernels.quantized import (
        conv1x1_bn_int8_pallas,
        conv3x3_bn_int8_pallas,
    )

    h = conv1x1_bn_int8_pallas(
        x, q["w_reduce_q"], q["w_reduce_s"], q["s_reduce"], q["b_reduce"], relu=True
    )
    h = conv3x3_bn_int8_pallas(
        h, q["w9_mid_q"], q["w9_mid_s"], q["s_mid"], q["b_mid"], relu=True
    )
    h = conv1x1_bn_int8_pallas(
        h, q["w_expand_q"], q["w_expand_s"], q["s_expand"], q["b_expand"], relu=False
    )
    skip = conv1x1_bn_int8_pallas(
        x, q["w_proj_q"], q["w_proj_s"], q["s_proj"], q["b_proj"], relu=False
    )
    return jnp.maximum(h + skip, 0.0)


def _head_int8(x: jax.Array, q: Dict) -> jax.Array:
    from winograd_tpu.kernels.quantized import conv1x1_bn_int8_pallas

    pooled = jnp.mean(x, axis=(-3, -2))
    wq, sw, b_fc = q["w_fc_q"], q["w_fc_s"], q["b_fc"]
    nc = wq.shape[1]
    pad = _class_pad(nc)
    if pad:
        wq = jnp.pad(wq, ((0, 0), (0, pad)))
        sw = jnp.pad(sw, ((0, pad),), constant_values=1.0)
        b_fc = jnp.pad(b_fc, ((0, pad),))
    logits = conv1x1_bn_int8_pallas(
        pooled, wq, sw, jnp.ones((nc + pad,), jnp.float32), b_fc, relu=False
    )
    return logits[..., :nc]


def resnet50_forward_int8(x: jax.Array, qparams: Dict) -> jax.Array:
    """Full ResNet-50 at the int8 serving tier (stem f32 — see
    _map_batch_chunks for the chunked-batch serving loop;
    quantize_resnet50)."""
    if x.ndim == 4 and x.shape[0] > SERVE_CHUNK and x.shape[0] % SERVE_CHUNK == 0:
        return _map_batch_chunks(
            lambda c: resnet50_forward_int8(c, qparams), x
        )
    h = stem_pallas(x, qparams["stem"], precision="int8")
    h = _projection_block_int8(h, qparams["proj"])
    h = resnet50_stages_int8(h, qparams["stages"])
    return _head_int8(h, qparams["head"])


def init_resnet50_params(cfg, seed: int = 0) -> Dict:
    """Random full-model params in the resnet50_forward_pallas structure —
    no float64 golden chain (that's make_resnet50_case's job), so this is
    fast enough for compile checks and engine warmup."""
    from winograd_tpu.datagen.generate import (
        _block_params_random,
        _bn_params,
        _rand,
        _transition_params_random,
    )
    from winograd_tpu.config import TransitionConfig
    from winograd_tpu.kernels import transforms

    rng = np.random.default_rng(seed)
    w7 = _rand(rng, cfg.stem_c, 3, 7, 7)
    bn_stem = _bn_params(rng, cfg.stem_c, scale=0.5)
    c_io0, c_mid0 = cfg.stages[0][0], cfg.stages[0][1]
    p0 = _transition_params_random(
        rng, TransitionConfig("p0", cfg.stem_c, c_mid0, c_io0, hw=cfg.stages[0][2]),
        bn_scale=0.5,
    )
    p0["u2_mid"] = transforms.transform_filter(p0["w_mid"], m=2)
    stages = []
    prev = None
    for c_io, c_mid, hw, blocks in cfg.stages:
        transition = None
        if prev is not None:
            transition = _transition_params_random(
                rng, TransitionConfig("t", prev, c_mid, c_io, hw=2 * hw), bn_scale=0.5
            )
        stages.append(
            {
                "transition": transition,
                "blocks": [
                    _block_params_random(rng, c_io, c_mid, bn_scale=0.5)
                    for _ in range(blocks)
                ],
            }
        )
        prev = c_io
    return {
        "stem": {
            "w49_stem": stem_filter(w7), "w7_stem": w7,
            "w192_stem": stem_filter_s2d(w7),
            "s_stem": bn_stem["scale"], "b_stem": bn_stem["bias"],
        },
        "proj": p0,
        "stages": stages,
        "head": {
            "w_fc": _rand(
                rng, cfg.stages[-1][0], cfg.num_classes,
                scale=2 * np.sqrt(2.0 / cfg.stages[-1][0]),
            ),
            "b_fc": _rand(rng, cfg.num_classes),
        },
    }


def resnet50_params(case: Dict[str, np.ndarray], cfg) -> Dict:
    """Build the nested forward-params structure from a flat
    make_resnet50_case dict (datagen/generate.py)."""
    from winograd_tpu.datagen.generate import backbone_stages

    proj_keys = (
        "w_reduce", "s_reduce", "b_reduce", "w_mid", "u2_mid", "w9_mid",
        "s_mid", "b_mid", "w_expand", "s_expand", "b_expand",
        "w_proj", "s_proj", "b_proj",
    )
    return {
        "stem": {
            "w49_stem": case["stem_w49"],
            "w7_stem": case["stem_w7"],
            "w192_stem": case.get("stem_w192", stem_filter_s2d(case["stem_w7"])),
            "s_stem": case["stem_scale"],
            "b_stem": case["stem_bias"],
        },
        "proj": {k: case[f"p0_{k}"] for k in proj_keys if f"p0_{k}" in case},
        "stages": backbone_stages(cfg, case),
        "head": {"w_fc": case["head_wfc"], "b_fc": case["head_bfc"]},
    }

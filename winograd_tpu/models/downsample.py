"""Downsampling bottleneck block (stage transition) and the full backbone.

The reference benchmarks only identity-skip blocks at a fixed resolution;
real ResNet deployment needs the stride-2 transition blocks between stages.
Composition is TPU-first:

* stride-2 1x1 (reduce at entry / projection shortcut): subsample the NHWC
  activation (an XLA slice that fuses into the consumer) then the fused
  pointwise Pallas GEMM — a stride-2 1x1 conv IS subsample+GEMM.
* stride-2 3x3: strided im2col prepared with 9 strided slices (XLA fuses
  them into one copy), then the same fused GEMM+BN+ReLU Pallas kernel the
  1x1 path uses — the MXU sees a dense (H/2*W/2, 9*Cin) GEMM.

`resnet50_stages` chains conv3_x -> conv4_x -> conv5_x with these
transitions: a full multi-stage backbone through the fused kernels.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.models.resnet import bottleneck_block_pallas


def _subsample(x: jax.Array) -> jax.Array:
    return x[..., ::2, ::2, :]


def _strided_im2col(x: jax.Array) -> jax.Array:
    """(..., H, W, C) -> (..., ceil(H/2), ceil(W/2), 9*C) stride-2 SAME-pad
    3x3 patches, channel-ordered to match kernels/direct.py's w9 layout."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    ho, wo = -(-h // 2), -(-w // 2)
    xp = jnp.pad(x, ((0, 0), (1, 1 + 2 * ho - h), (1, 1 + 2 * wo - w), (0, 0)))
    cols = [
        xp[:, r : r + 2 * ho : 2, s : s + 2 * wo : 2, :]
        for r in range(3)
        for s in range(3)
    ]
    out = jnp.concatenate(cols, axis=-1)
    return out[0] if squeeze else out


def conv3x3_s2_bn_relu_pallas(x, w9, scale, bias, relu: bool = True) -> jax.Array:
    """Stride-2 SAME 3x3 conv + BN (+ReLU): strided im2col + fused GEMM."""
    cols = _strided_im2col(x)
    return conv1x1_bn_pallas(cols, w9, scale, bias, relu=relu)


def projection_bottleneck_block_pallas(
    x: jax.Array, params: Dict, precision: str | None = None
) -> jax.Array:
    """Stride-1 PROJECTION bottleneck (conv2_x's entry block in the full
    ResNet-50): 1x1 reduce -> 3x3 -> 1x1 expand, 1x1 projection shortcut —
    channels change (64 -> 256), resolution doesn't. Composed from the
    per-layer fused kernels; the 3x3 runs the F(2,3) Winograd megakernel
    when the u2_mid artifact is present (the fast algebra at 56x56).

    This block exists once per network and carries ~2% of its FLOPs, so
    per-layer fusion (4 Pallas kernels + one XLA add/ReLU) is the right
    cost/complexity point vs a dedicated megakernel."""
    kw = {} if precision is None else {"precision": precision}
    h = conv1x1_bn_pallas(
        x, params["w_reduce"], params["s_reduce"], params["b_reduce"], relu=True, **kw
    )
    if "u2_mid" in params:
        from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas

        h = conv3x3_bn_winograd_pallas(
            h, params["u2_mid"], params["s_mid"], params["b_mid"], relu=True, **kw
        )
    else:
        from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas

        h = conv3x3_bn_direct_pallas(
            h, params["w9_mid"], params["s_mid"], params["b_mid"], relu=True, **kw
        )
    h = conv1x1_bn_pallas(
        h, params["w_expand"], params["s_expand"], params["b_expand"], relu=False, **kw
    )
    skip = conv1x1_bn_pallas(
        x, params["w_proj"], params["s_proj"], params["b_proj"], relu=False, **kw
    )
    return jnp.maximum(h + skip, 0.0)


def downsample_bottleneck_block_pallas(
    x: jax.Array, params: Dict, algo: str = "fused", precision: str | None = None
) -> jax.Array:
    """ResNet v1.5 transition block: 1x1 reduce -> stride-2 3x3 -> 1x1
    expand, stride-2 1x1 projection shortcut. Extra params vs the identity
    block: w_proj (Cin, Cout_io), s_proj, b_proj; w9_mid in direct layout.

    algo "fused" (default) runs the whole block as ONE Pallas megakernel
    (kernels/transition.py); "composed" chains the per-layer fused kernels
    with XLA strided staging (the round-1 path, kept as a second
    implementation / oracle). precision="bf16w" (fused only) streams
    bfloat16 weights at half the f32 bytes (~1e-3 relative tier)."""
    if algo == "fused":
        from winograd_tpu.kernels.transition import transition_block_fused_pallas

        kw = {} if precision is None else {"precision": precision}
        return transition_block_fused_pallas(x, params, **kw)
    assert precision is None, "precision tiers require the fused kernel"
    assert algo == "composed", algo
    h = conv1x1_bn_pallas(x, params["w_reduce"], params["s_reduce"], params["b_reduce"], relu=True)
    h = conv3x3_s2_bn_relu_pallas(h, params["w9_mid"], params["s_mid"], params["b_mid"], relu=True)
    h = conv1x1_bn_pallas(h, params["w_expand"], params["s_expand"], params["b_expand"], relu=False)
    skip = conv1x1_bn_pallas(
        _subsample(x), params["w_proj"], params["s_proj"], params["b_proj"], relu=False
    )
    return jnp.maximum(h + skip, 0.0)


def resnet50_stages(
    x: jax.Array, stages: List[Dict], precision: str | None = None
) -> jax.Array:
    """Run a list of stages; each stage dict has optional "transition"
    (downsample params) and "blocks" (list of identity-block params).
    Identity runs go through resnet_stage_pallas, which fuses a uniform
    stage into ONE weight-streaming Pallas kernel when it fits.

    precision="bf16w" serves the whole backbone at the bf16 weight-storage
    tier: every stage kernel and every transition kernel streams bfloat16
    weights (half the f32 HBM bytes end to end, ~1e-3 relative bound —
    the middle tier between f32 parity and int8)."""
    from winograd_tpu.models.resnet import resnet_stage_pallas

    for stage in stages:
        if stage.get("transition") is not None:
            x = downsample_bottleneck_block_pallas(
                x, stage["transition"], precision=precision
            )
        x = resnet_stage_pallas(x, stage["blocks"], precision=precision)
    return x


def resnet50_stages_train(
    x: jax.Array, stages: List[Dict], precision: str | None = None
) -> jax.Array:
    """Differentiable multi-stage backbone whose FORWARD runs the SAME
    fused megakernels serving uses (block + transition custom VJPs,
    kernels/vjp.py) — trained forward == served forward, end to end.
    Block/transition params carry the raw w_mid (offline layouts derived
    in-trace); BN stays folded (scale, bias), matching the training
    parameterization of models/resnet.py::bottleneck_block_train.

    VMEM-heavy blocks run the weight-STREAMING stage megakernel as their
    forward (kernels/vjp.py::resnet_stage_train_streamed) instead of the
    whole-block megakernel: under autodiff the block megakernel's working
    set exceeds the 16 MB scoped-vmem limit at conv2_x geometry
    (56x56x256: 17.0 MB, measured mode-19 compile OOM) and sits within
    noise of it at conv5_x (7x7x2048 stages 17.4 MB of whole weight
    matrices; 16.62 MB accounted — over by 632 KB once the surrounding
    train step's copies land). The stage kernel streams weights so its
    footprint is bounded — and it is what serving runs at these
    geometries, so the trained forward matches the served forward on
    EVERY block (the per-layer fallback it replaces paid ~5 HBM
    activation round trips per block)."""
    from winograd_tpu.kernels.vjp import (
        bottleneck_block_train_fused,
        resnet_stage_train_streamed,
        transition_block_train_fused,
    )

    for stage in stages:
        if stage.get("transition") is not None:
            x = transition_block_train_fused(x, stage["transition"], precision)
        blocks = stage["blocks"]
        if not blocks:
            continue
        # Identity blocks in a stage share geometry, so the gate is a
        # per-stage decision.
        if x.shape[-2] > 28 or blocks[0]["w_reduce"].shape[0] >= 2048:
            x = resnet_stage_train_streamed(x, blocks, precision)
        else:
            for b in blocks:
                x = bottleneck_block_train_fused(x, b, precision)
    return x


def quantize_backbone(stages: List[Dict]) -> List[Dict]:
    """Offline int8 quantization of a whole backbone (resnet50_stages
    structure) for resnet50_stages_int8."""
    from winograd_tpu.kernels.quantized import (
        quantize_stage_params,
        quantize_transition_params,
    )

    return [
        {
            "transition": None
            if st.get("transition") is None
            else quantize_transition_params(st["transition"]),
            "blocks": quantize_stage_params(st["blocks"]),
        }
        for st in stages
    ]


def resnet50_stages_int8(x: jax.Array, qstages: List[Dict]) -> jax.Array:
    """The full multi-stage backbone at the int8 serving tier: every
    identity stage through the int8 weight-streaming stage kernel, every
    stride-2 transition through the int8 transition kernel (4x fewer
    weight bytes end to end; 8-bit accuracy bound)."""
    from winograd_tpu.kernels.quantized import (
        resnet_stage_int8_pallas,
        transition_block_int8_pallas,
    )

    for st in qstages:
        if st.get("transition") is not None:
            x = transition_block_int8_pallas(x, st["transition"])
        x = resnet_stage_int8_pallas(x, st["blocks"])
    return x

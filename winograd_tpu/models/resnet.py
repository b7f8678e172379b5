"""ResNet bottleneck block / stage, composed from the fused TPU kernels.

The reference benchmarks the six fused layers of a ResNet bottleneck block
at the 14x14 stage in isolation (SURVEY.md §2); the block itself is never
composed in code (only in the report's Figure 1). This module IS that
composition, in both flavors:

* bottleneck_block_pallas — the production path: fused Pallas pointwise
  reduce (+ReLU), fused single-kernel Winograd 3x3 (+ReLU), fused pointwise
  expand (NO ReLU — /root/reference/Kernel128_one.cu:271-272), skip add +
  final ReLU.
* bottleneck_block_baseline — the same math through the jitted XLA ops
  (differentiable; used by the training path and as the block oracle).

Parameters live in a plain dict pytree (idiomatic functional JAX — no
framework dependency), with BN offline-folded into (scale, bias) pairs and
the 3x3 filter offline-Winograd-transformed, matching the reference's
preprocessing contract (data_generator.py:41-47,63-78).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.kernels import transforms
from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.ops import jnp_ops

BottleneckParams = Dict[str, jax.Array]


def init_bottleneck_params(
    key: jax.Array | int, c_io: int = 1024, c_mid: int = 256
) -> BottleneckParams:
    """He-style random init, BN pre-folded to identity-ish scale/bias."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(key, 3)
    w_mid = jax.random.normal(k2, (c_mid, c_mid, 3, 3), jnp.float32) * np.sqrt(
        2.0 / (9 * c_mid)
    )
    params = {
        "w_reduce": jax.random.normal(k1, (c_io, c_mid), jnp.float32) * np.sqrt(2.0 / c_io),
        "s_reduce": jnp.ones((c_mid,), jnp.float32),
        "b_reduce": jnp.zeros((c_mid,), jnp.float32),
        "w_mid": w_mid,
        "s_mid": jnp.ones((c_mid,), jnp.float32),
        "b_mid": jnp.zeros((c_mid,), jnp.float32),
        "w_expand": jax.random.normal(k3, (c_mid, c_io), jnp.float32) * np.sqrt(2.0 / c_mid),
        "s_expand": jnp.ones((c_io,), jnp.float32),
        "b_expand": jnp.zeros((c_io,), jnp.float32),
    }
    params["u_mid"] = winograd_transform_params(w_mid)
    params["u2_mid"] = winograd_transform_params(w_mid, m=2)
    params["w9_mid"] = jnp.asarray(direct_filter(np.asarray(w_mid)))
    return params


def winograd_transform_params(w_mid: jax.Array, m: int = 4) -> jax.Array:
    """Offline filter transform for the 3x3 conv:
    (Cout,Cin,3,3) -> (a^2,Cin,Cout); m selects the algebra (4 or 2)."""
    return jnp.asarray(transforms.transform_filter(np.asarray(w_mid), m=m))


def bottleneck_block_pallas(
    x: jax.Array, params: BottleneckParams, algo3x3: str = "auto"
) -> jax.Array:
    """Fused-kernel bottleneck. x: (..., H, W, Cio).

    algo3x3 selects the implementation (the role cuDNN's algo enum plays in
    the reference): "fused" (the whole block as ONE Pallas megakernel —
    kernels/block.py, fastest measured), "direct" / "winograd" (three
    per-layer fused kernels with that 3x3 algorithm), or "auto" (fused when
    the w9_mid artifact is present, winograd otherwise).
    """
    if algo3x3 == "auto":
        if "w9_mid" not in params:
            algo3x3 = "winograd"
        else:
            # The megakernel keeps all three weight matrices VMEM-resident;
            # fall back to the per-layer kernels when they would not fit
            # (e.g. ResNet conv5_x: Cio=2048, Cmid=512 -> ~18 MB of weights).
            cio = params["w_reduce"].shape[0]
            cmid = params["w_reduce"].shape[1]
            weight_bytes = 4 * (2 * cio * cmid + 9 * cmid * cmid)
            algo3x3 = "fused" if weight_bytes <= 8 * 2**20 else "direct"
    if algo3x3 == "fused":
        from winograd_tpu.kernels.block import bottleneck_block_fused_pallas

        return bottleneck_block_fused_pallas(x, params)
    h = conv1x1_bn_pallas(x, params["w_reduce"], params["s_reduce"], params["b_reduce"], relu=True)
    if algo3x3 == "direct":
        h = conv3x3_bn_direct_pallas(h, params["w9_mid"], params["s_mid"], params["b_mid"], relu=True)
    elif algo3x3 == "winograd":
        h = conv3x3_bn_winograd_pallas(h, params["u_mid"], params["s_mid"], params["b_mid"], relu=True)
    else:
        raise ValueError(f"unknown algo3x3 {algo3x3!r}")
    h = conv1x1_bn_pallas(h, params["w_expand"], params["s_expand"], params["b_expand"], relu=False)
    return jnp.maximum(h + x, 0.0)


def bottleneck_block_baseline(x: jax.Array, params: BottleneckParams) -> jax.Array:
    """XLA-ops bottleneck (differentiable oracle; uses raw w_mid, not u_mid)."""
    return jnp_ops.bottleneck_block(x, params)


def bottleneck_block_train(
    x: jax.Array, params: BottleneckParams, algo3x3: str = "fused"
) -> jax.Array:
    """Differentiable bottleneck with fused Pallas FORWARD kernels (custom
    VJPs, kernels/vjp.py) — same signature/params as the baseline (raw
    w_mid; the offline filter layouts are derived inside the trace).

    algo3x3 "fused" (default) runs the forward as the SAME single
    megakernel serving uses (kernels/block.py) so trained forward ==
    served forward; "winograd" chains the three per-layer fused kernels."""
    from winograd_tpu.kernels import vjp

    if algo3x3 == "fused":
        return vjp.bottleneck_block_train_fused(x, params)
    assert algo3x3 == "winograd", algo3x3
    h = vjp.conv1x1_bn_train(x, params["w_reduce"], params["s_reduce"], params["b_reduce"], True)
    h = vjp.conv3x3_bn_winograd_train(h, params["w_mid"], params["s_mid"], params["b_mid"], True, 4)
    h = vjp.conv1x1_bn_train(h, params["w_expand"], params["s_expand"], params["b_expand"], False)
    return jnp.maximum(h + x, 0.0)


def resnet_stage_pallas(
    x: jax.Array, params_list, algo: str = "auto", precision: str | None = None
) -> jax.Array:
    """A stack of bottleneck blocks (e.g. ResNet-50 conv4_x is 6 of these).

    algo: "fused_stage" runs the WHOLE stage as one Pallas kernel with
    weight streaming (kernels/stage.py — fastest measured); "per_block"
    chains block kernels; "auto" picks fused_stage when every block shares
    the conv4_x-class geometry and has the direct-layout artifact.

    precision="bf16w" selects the bf16 weight-storage serving tier: the
    stage kernel streams bfloat16 weights at half the f32 bytes (the lever
    for HBM-bound geometries like conv5_x), ~1e-3 relative tier bound. It
    always uses the streaming stage kernel, single-block stages included.
    """
    bf16w = precision == "bf16w"
    if algo == "auto":
        uniform = (
            (len(params_list) > 1 or bf16w)
            and all("w9_mid" in p for p in params_list)
            and len({p["w_reduce"].shape for p in params_list}) == 1
        )
        if uniform:
            cio, cmid = params_list[0]["w_reduce"].shape
            # One block's weights, double-buffered, must fit next to the
            # activation/col scratch (see kernels/stage.py); the bf16 tier
            # halves the per-block bytes and rides the kernel's dynamic
            # VMEM cap, so its ceiling is looser. f32 conv5_x stays on
            # per_block: the block megakernel's batch-constant weight index
            # maps make it effectively weight-resident at N>1 already
            # (kernels/block.py grid=(n,)), measured faster than streaming
            # 17.8 MB/block through the stage kernel per image.
            wbytes = (2 if bf16w else 4) * 2 * (2 * cio * cmid + 9 * cmid * cmid)
            uniform = wbytes <= (40 * 2**20 if bf16w else 10 * 2**20)
        algo = "fused_stage" if uniform else "per_block"
    if algo == "fused_stage":
        from winograd_tpu.kernels.stage import (
            resnet_stage_fused_pallas,
            stack_stage_params,
        )

        kw = {} if precision is None else {"precision": precision}
        return resnet_stage_fused_pallas(x, stack_stage_params(params_list), **kw)
    if bf16w:
        raise ValueError(
            "precision='bf16w' requires the weight-streaming fused_stage "
            "kernel, but this stage resolved to per_block (non-uniform block "
            "geometries, a missing w9_mid artifact, or weights past the VMEM "
            "cap); serve it at f32 or make the stage uniform"
        )
    for params in params_list:
        x = bottleneck_block_pallas(x, params)
    return x

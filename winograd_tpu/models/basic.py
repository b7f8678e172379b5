"""The BASIC-block ResNet family (ResNet-18/34) — stem + stages + head.

The reference scopes to bottleneck layers (/root/reference/report.pdf
section 1); ResNet-18/34 are the other half of the standard ResNet model
space: BASIC blocks of two 3x3 convs (torchvision BasicBlock semantics),
with stride-2 entry blocks between stages. The whole family composes from
kernels that already exist — NO new device code:

* stride-1 3x3 (+BN, ReLU optional): the fused F(2,3) Winograd megakernel
  (kernels/winograd.py) — the measured-fastest 3x3 path at every geometry.
* stride-2 3x3: strided im2col (9 strided XLA slices fused into one copy)
  into the SAME fused GEMM+BN+ReLU pointwise kernel
  (models/downsample.py::conv3x3_s2_bn_relu_pallas's recipe).
* stride-2 1x1 projection shortcut: subsample + fused pointwise GEMM.
* stem / head: shared with the bottleneck family (models/resnet50.py).

Tiers: f32 (strict 1e-4 logits parity), bf16w (bfloat16 weight storage
end to end), int8 (per-channel weights + per-row dynamic activation
quant through kernels/quantized.py; the stem stays f32 like ResNet-50's).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.models.downsample import _strided_im2col, _subsample
from winograd_tpu.models.resnet50 import head_pallas, stem_pallas
from winograd_tpu.ops import jnp_ops

BasicParams = Dict[str, jax.Array]


def _conv3x3(x, p, leg: str, relu: bool, precision):
    """Stride-1 3x3 + BN (+ReLU), geometry-routed between the fused F(2,3)
    Winograd kernel (u2_* artifact) and the direct im2col kernel (w9_*).

    Measured per-layer on v5e (tools/exp_basicroute.py, 2026-08-19):
    Winograd wins every stride-1 geometry down to 14x14 (56x56x64: 9.0;
    28x28x128: 4.7 vs 8.2; 14x14x256: 7.9 vs 10.1 f32) EXCEPT 7x7x512,
    where the F(2,3) artifact streams 16/9x the direct layout's bytes over
    a map too small to amortize (f32 27.5 vs 16.2, bf16w 12.9 vs 9.6) —
    the small-map half of the same weight-stream bound that routes the
    bottleneck megakernels' mid conv direct below 28x28 (kernels/stage.py).
    """
    kw = {} if precision is None else {"precision": precision}
    small_map = x.shape[-2] * x.shape[-3] <= 8 * 8
    if f"u2_{leg}" in p and not (small_map and f"w9_{leg}" in p):
        return conv3x3_bn_winograd_pallas(
            x, p[f"u2_{leg}"], p[f"s_{leg}"], p[f"b_{leg}"], relu=relu, **kw
        )
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas

    return conv3x3_bn_direct_pallas(
        x, p[f"w9_{leg}"], p[f"s_{leg}"], p[f"b_{leg}"], relu=relu, **kw
    )


def basic_block_pallas(
    x: jax.Array, params: BasicParams, precision: str | None = None
) -> jax.Array:
    """Identity BASIC block: 3x3+BN+ReLU -> 3x3+BN -> add skip -> ReLU.
    x: (..., H, W, C); both convs C -> C (offline artifacts u2_a/u2_b or
    w9_a/w9_b, folded BN s_*/b_*)."""
    h = _conv3x3(x, params, "a", True, precision)
    h = _conv3x3(h, params, "b", False, precision)
    return jnp.maximum(h + x, 0.0)


def downsample_basic_block_pallas(
    x: jax.Array, params: BasicParams, precision: str | None = None
) -> jax.Array:
    """Stride-2 entry BASIC block: stride-2 3x3 (+BN+ReLU) -> 3x3 (+BN) with
    a stride-2 1x1 projection shortcut (+BN); add -> ReLU. Extra keys vs the
    identity block: w9_a is the (9*Cin, Cout) direct layout of the STRIDED
    conv, w_proj (Cin, Cout), s_proj, b_proj."""
    kw = {} if precision is None else {"precision": precision}
    cols = _strided_im2col(x)
    h = conv1x1_bn_pallas(
        cols, params["w9_a"], params["s_a"], params["b_a"], relu=True, **kw
    )
    h = _conv3x3(h, params, "b", False, precision)
    skip = conv1x1_bn_pallas(
        _subsample(x), params["w_proj"], params["s_proj"], params["b_proj"],
        relu=False, **kw,
    )
    return jnp.maximum(h + skip, 0.0)


# Channel threshold below which a stage's identity run is NOT worth fusing
# into the weight-streaming basic-stage kernel (the 7x7x512 conv5 run is the
# winning geometry; smaller widths at small maps lose the streaming setup).
# Shared by the offline artifact attach AND the training-route gate so the
# "trained forward == served forward" invariant can't drift between them.
FUSED_STAGE_MIN_CHANNELS = 512


def fused_stage_eligible(blocks: List[Dict], wkey: str = "w9_a",
                         min_channels: int = FUSED_STAGE_MIN_CHANNELS) -> bool:
    """True when a stage's identity blocks qualify for the fused
    weight-streaming basic-stage kernel: uniform shapes at or above the
    channel threshold. wkey selects the filter key to inspect: "w9_a"
    (9*C, C) on serving params, "w_a" raw OIHW (C, C, 3, 3) on trainable
    params — the output-channel count is the last axis of the former and
    the first of the latter."""
    if not blocks or not all(
        wkey in b and wkey.replace("_a", "_b") in b for b in blocks
    ):
        return False
    w = blocks[0][wkey]
    channels = w.shape[-1] if w.ndim == 2 else w.shape[0]
    return channels >= min_channels and len(
        {tuple(b[wkey].shape) for b in blocks}
    ) == 1


def attach_fused_stage_artifacts(params: Dict, min_channels: int = FUSED_STAGE_MIN_CHANNELS) -> Dict:
    """Offline step: attach the stacked weight-streaming artifact
    ("fused", kernels/basic_stage.py::stack_basic_stage_params) to every
    stage whose identity blocks will serve through the fused basic-stage
    kernel — the small-map direct-route geometries (7x7x512 in the
    ImageNet family, hence the min_channels proxy; the actual route gate
    is the trace-time map size in basicnet_stages). Mutates and returns
    params.

    The stacked artifact COPIES each block's w9_a/w9_b: any later rewrite
    of st["blocks"] (e.g. loading fresh weights into an existing params
    dict) must re-run this function, or basicnet_stages would serve the
    stale stack. To make that failure-mode impossible to hit silently,
    stages that no longer qualify get their "fused" entry DELETED here, so
    re-attaching after any weight mutation is always safe and idempotent."""
    from winograd_tpu.kernels.basic_stage import stack_basic_stage_params

    for st in params["stages"]:
        if fused_stage_eligible(st["blocks"], min_channels=min_channels):
            st["fused"] = stack_basic_stage_params(st["blocks"])
        else:
            st.pop("fused", None)
    return params


def basicnet_stages(
    x: jax.Array, stages: List[Dict], precision: str | None = None
) -> jax.Array:
    """Run the basic-block trunk: each stage dict has optional "entry" (the
    stride-2 downsample block) and "blocks" (identity blocks). A stage
    carrying the offline-stacked "fused" artifact runs its identity run as
    ONE weight-streaming kernel on small maps (kernels/basic_stage.py —
    act stays in VMEM across both convs and all blocks; the per-layer
    route pays an HBM round trip per conv on a weight-bound shape)."""
    for st in stages:
        if st.get("entry") is not None:
            x = downsample_basic_block_pallas(x, st["entry"], precision)
        fused = st.get("fused")
        if fused is not None and 0 < x.shape[-2] * x.shape[-3] <= 8 * 8:
            from winograd_tpu.kernels.basic_stage import basic_stage_fused_pallas

            x = basic_stage_fused_pallas(
                x, fused,
                precision="bf16x3" if precision is None else precision,
            )
        else:
            for b in st["blocks"]:
                x = basic_block_pallas(x, b, precision)
    return x


def basicnet_forward_pallas(
    x: jax.Array, params: Dict, precision: str | None = None
) -> jax.Array:
    """Full ResNet-18/34 forward through the fused Pallas kernels.
    params: {"stem", "stages", "head"} (no projection entry block — the
    basic family's stage 0 is all identity blocks at the stem's width)."""
    h = stem_pallas(x, params["stem"], precision)
    h = basicnet_stages(h, params["stages"], precision)
    return head_pallas(h, params["head"], precision)


def basicnet_forward_pre(
    xb: jax.Array, params: Dict, precision: str | None = None,
    *, h: int = 224, w: int = 224,
) -> jax.Array:
    """Full ResNet-18/34 forward from a PREPARED stem operand (the
    preprocessed-input contract, models/resnet50.py::stem_pallas_pre)."""
    from winograd_tpu.models.resnet50 import stem_pallas_pre

    hh = stem_pallas_pre(xb, params["stem"], precision, h=h, w=w)
    hh = basicnet_stages(hh, params["stages"], precision)
    return head_pallas(hh, params["head"], precision)


def basicnet_forward_xla(x: jax.Array, params: Dict) -> jax.Array:
    """The same network through jitted XLA ops (the vendor-baseline role)."""
    h = jnp_ops.stem(x, params["stem"])
    for st in params["stages"]:
        if st.get("entry") is not None:
            h = jnp_ops.downsample_basic_block(h, st["entry"])
        for b in st["blocks"]:
            h = jnp_ops.basic_block(h, b)
    return jnp_ops.head(h, params["head"])


def basicnet_forward_train(
    x: jax.Array, params: Dict, precision: str | None = None,
    *, fused_min_channels: int = FUSED_STAGE_MIN_CHANNELS,
) -> jax.Array:
    """Differentiable forward whose convs run the SAME fused Pallas kernels
    serving uses (custom VJPs, kernels/vjp.py): the fused stem kernel, the
    F(2,3) Winograd train kernel for stride-1 3x3s, the fused GEMM for the
    strided convs (w9 layout derived in-trace so gradients flow to the raw
    OIHW filter), and the head FC. params carries the TRAINABLE set only:
    raw w_a/w_b filters + folded BN (no offline layouts).
    precision="bf16w" is the bf16 weight-storage training tier (f32 master
    weights, bf16w serving kernels as the forward, f32/HIGH backward)."""
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.kernels.vjp import (
        basic_stage_train_streamed,
        conv1x1_bn_train,
        conv3x3_bn_direct_train,
        conv3x3_bn_winograd_train,
        stem_train_fused,
    )

    def conv3x3_train(x_, w, s, b, relu):
        # Same geometry routing as serving (_conv3x3): direct im2col on
        # small maps (7x7x512 — the winograd layout streams 16/9x the
        # bytes), F(2,3) winograd everywhere else.
        if x_.shape[-2] * x_.shape[-3] <= 8 * 8:
            return conv3x3_bn_direct_train(x_, w, s, b, relu, precision)
        return conv3x3_bn_winograd_train(x_, w, s, b, relu, 2, precision)

    h = stem_train_fused(x, params["stem"], precision)
    for st in params["stages"]:
        e = st.get("entry")
        if e is not None:
            cols = _strided_im2col(h)
            g = conv1x1_bn_train(
                cols, direct_filter(e["w_a"]), e["s_a"], e["b_a"], True, precision
            )
            g = conv3x3_train(g, e["w_b"], e["s_b"], e["b_b"], False)
            skip = conv1x1_bn_train(
                _subsample(h), e["w_proj"], e["s_proj"], e["b_proj"], False,
                precision,
            )
            h = jnp.maximum(g + skip, 0.0)
        blocks = st["blocks"]
        if (
            blocks
            and 0 < h.shape[-2] * h.shape[-3] <= 8 * 8
            and fused_stage_eligible(
                blocks, wkey="w_a", min_channels=fused_min_channels
            )
        ):
            # Small-map identity runs train through the fused basic-stage
            # kernel (the serving route) — one weight-streaming forward
            # instead of per-conv per-layer kernels. Gated on the SAME
            # eligibility predicate serving's artifact attach uses (map
            # size + channel width) so trained forward == served forward
            # holds at every geometry; pass the same fused_min_channels a
            # non-default attach_fused_stage_artifacts used, so a custom
            # serving threshold keeps the two routes in lockstep.
            h = basic_stage_train_streamed(h, blocks, precision)
        else:
            for b in blocks:
                g = conv3x3_train(h, b["w_a"], b["s_a"], b["b_a"], True)
                g = conv3x3_train(g, b["w_b"], b["s_b"], b["b_b"], False)
                h = jnp.maximum(g + h, 0.0)
    return head_pallas(
        h,
        params["head"],
        gemm=lambda p, w, s, b: conv1x1_bn_train(p, w, s, b, False, precision),
    )


def quantize_basicnet(params: Dict) -> Dict:
    """Offline int8 quantization of the full basic-block model (per-output-
    channel weight scales; the stem stays f32 like quantize_resnet50's)."""
    from winograd_tpu.kernels.quantized import quantize_weights

    def q(w, prefix):
        wq, sw = quantize_weights(np.asarray(w))
        return {f"{prefix}_q": jnp.asarray(wq), f"{prefix}_s": jnp.asarray(sw)}

    def q_block(p, small_map_stage=False):
        # small_map_stage: the stage carries the fused weight-streaming
        # artifact, i.e. it runs at <=8x8 maps where _conv3x3_int8 always
        # falls back to the direct w9 route — no winograd artifact needed.
        out = {
            k: jnp.asarray(p[k], jnp.float32)
            for k in ("s_a", "b_a", "s_b", "b_b")
        }
        out.update(q(p["w9_a"], "w9_a"))
        out.update(q(p["w9_b"], "w9_b"))
        # Stride-1 3x3s also carry the F(2,3) filter in the ONE
        # low-precision form their width can route to (_conv3x3_int8's
        # static cout gate): bfloat16 when cout <= 64 (the lane-packed
        # bf16w kernel wins 56x56x64) or per-position int8 otherwise
        # (quantize_winograd_filter — fastest on 28x28/14x14 since the
        # round-5 quantized V stash). Attaching both would ship a dead
        # multi-MB artifact per conv, replicated per chip under DP.
        from winograd_tpu.kernels.quantized import quantize_winograd_filter

        for leg in ("a", "b") if not small_map_stage else ():
            if f"u2_{leg}" in p:
                if p[f"s_{leg}"].shape[0] <= 64:
                    out[f"u2_{leg}_bf16"] = jnp.asarray(
                        p[f"u2_{leg}"], jnp.float32
                    ).astype(jnp.bfloat16)
                else:
                    uq, su = quantize_winograd_filter(
                        np.asarray(p[f"u2_{leg}"])
                    )
                    out[f"u2_{leg}_q"] = jnp.asarray(uq)
                    out[f"u2_{leg}_s"] = jnp.asarray(su)
        if "w_proj" in p:
            out.update(q(p["w_proj"], "w_proj"))
            out["s_proj"] = jnp.asarray(p["s_proj"], jnp.float32)
            out["b_proj"] = jnp.asarray(p["b_proj"], jnp.float32)
        return out

    wq, sw = quantize_weights(np.asarray(params["head"]["w_fc"]))
    from winograd_tpu.kernels.basic_stage import quantize_basic_stage_params

    def q_stage(st):
        small = "fused" in st
        out = {
            "entry": None
            if st.get("entry") is None
            else q_block(st["entry"], small_map_stage=small),
            "blocks": [q_block(b, small_map_stage=small) for b in st["blocks"]],
        }
        # Mirror attach_fused_stage_artifacts: stages that serve through
        # the fused basic-stage kernel get the stacked int8 artifact too.
        if "fused" in st:
            out["fused"] = quantize_basic_stage_params(st["blocks"])
        return out

    return {
        "stem": params["stem"],
        "stages": [q_stage(st) for st in params["stages"]],
        "head": {
            "w_fc_q": jnp.asarray(wq),
            "w_fc_s": jnp.asarray(sw),
            "b_fc": jnp.asarray(params["head"]["b_fc"], jnp.float32),
        },
    }


def _conv3x3_int8(x: jax.Array, p: Dict, leg: str, relu: bool) -> jax.Array:
    """Geometry-routed stride-1 3x3 of the int8 tier. Measured per-layer
    on v5e (round 5, tools logs 2026-08-20, same-run ladders):

    * 56x56x64: the LANE-PACKED bf16w F(2,3) kernel wins (4.98 us vs
      int8-wino 11.61 / int8-direct 7.98) — at 64 channels the int8 path
      runs half-lane while the packed bf16w kernel fills the MXU;
    * 28x28x128 / 14x14x256: the int8 F(2,3) winograd kernel wins
      (3.17 / 3.45 us vs bf16w 3.31 / 4.53 and direct 5.14 / 4.59) —
      the round-5 quantized V stash removed the old cout>128 loss;
    * 7x7x512: int8 direct im2col wins (6.78 vs wino 9.29) — the F(2,3)
      artifact streams 16/9x the direct layout's bytes over a map too
      small to amortize (the same rule as the f32 route)."""
    from winograd_tpu.kernels.quantized import (
        conv3x3_bn_int8_pallas,
        conv3x3_bn_winograd_int8_pallas,
    )

    if x.shape[-2] * x.shape[-3] > 8 * 8:
        cout = p[f"s_{leg}"].shape[0]
        if cout <= 64 and f"u2_{leg}_bf16" in p:
            return conv3x3_bn_winograd_pallas(
                x, p[f"u2_{leg}_bf16"], p[f"s_{leg}"], p[f"b_{leg}"],
                relu=relu, precision="bf16w",
            )
        if f"u2_{leg}_q" in p:
            return conv3x3_bn_winograd_int8_pallas(
                x, p[f"u2_{leg}_q"], p[f"u2_{leg}_s"],
                p[f"s_{leg}"], p[f"b_{leg}"], relu=relu,
            )
    return conv3x3_bn_int8_pallas(
        x, p[f"w9_{leg}_q"], p[f"w9_{leg}_s"], p[f"s_{leg}"], p[f"b_{leg}"],
        relu=relu,
    )


def downsample_basic_block_int8(h: jax.Array, e: Dict) -> jax.Array:
    """Stride-2 entry BASIC block at the int8 tier (quantize_basicnet's
    q_block layout): strided conv + projection through the int8 pointwise
    kernel, the b-leg geometry-routed (_conv3x3_int8)."""
    from winograd_tpu.kernels.quantized import conv1x1_bn_int8_pallas

    cols = _strided_im2col(h)
    g = conv1x1_bn_int8_pallas(
        cols, e["w9_a_q"], e["w9_a_s"], e["s_a"], e["b_a"], relu=True
    )
    g = _conv3x3_int8(g, e, "b", relu=False)
    skip = conv1x1_bn_int8_pallas(
        _subsample(h), e["w_proj_q"], e["w_proj_s"],
        e["s_proj"], e["b_proj"], relu=False,
    )
    return jnp.maximum(g + skip, 0.0)


def basic_block_int8(h: jax.Array, b: Dict) -> jax.Array:
    """Identity BASIC block at the int8 tier (per-block route; the fused
    weight-streaming run is basic_stage_int8_pallas)."""
    g = _conv3x3_int8(h, b, "a", relu=True)
    g = _conv3x3_int8(g, b, "b", relu=False)
    return jnp.maximum(g + h, 0.0)


def basicnet_forward_int8(x: jax.Array, qparams: Dict) -> jax.Array:
    """Full ResNet-18/34 at the int8 serving tier: strided entry convs and
    projection shortcuts through the int8 pointwise kernel, stride-1 3x3s
    geometry-routed (_conv3x3_int8) between the int8 direct kernel and the
    bf16-weight winograd2 kernel, int8 head FC."""
    from winograd_tpu.models.resnet50 import _head_int8

    h = stem_pallas(x, qparams["stem"], precision="int8")
    for st in qparams["stages"]:
        e = st.get("entry")
        if e is not None:
            h = downsample_basic_block_int8(h, e)
        fused = st.get("fused")
        if fused is not None and 0 < h.shape[-2] * h.shape[-3] <= 8 * 8:
            from winograd_tpu.kernels.basic_stage import basic_stage_int8_pallas

            h = basic_stage_int8_pallas(h, fused)
        else:
            for b in st["blocks"]:
                h = basic_block_int8(h, b)
    return _head_int8(h, qparams["head"])


def basicnet_params(case: Dict[str, np.ndarray], cfg) -> Dict:
    """Build the nested forward-params structure from a flat
    make_basicnet_case dict (datagen/generate.py)."""
    from winograd_tpu.models.resnet50 import stem_filter, stem_filter_s2d

    def sub(prefix):
        return {
            k[len(prefix):]: case[k] for k in case if k.startswith(prefix)
        }

    stages = []
    for si in range(len(cfg.stages)):
        entry = sub(f"t{si}_") or None
        blocks, bi = [], 0
        while any(k.startswith(f"s{si}_b{bi}_") for k in case):
            blocks.append(sub(f"s{si}_b{bi}_"))
            bi += 1
        stages.append({"entry": entry, "blocks": blocks})
    return attach_fused_stage_artifacts({
        "stem": {
            "w49_stem": case["stem_w49"],
            "w7_stem": case["stem_w7"],
            "w192_stem": case.get("stem_w192", stem_filter_s2d(case["stem_w7"])),
            "s_stem": case["stem_scale"],
            "b_stem": case["stem_bias"],
        },
        "stages": stages,
        "head": {"w_fc": case["head_wfc"], "b_fc": case["head_bfc"]},
    })

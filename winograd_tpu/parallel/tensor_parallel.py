"""Tensor-parallel fused pointwise conv: Pallas compute + explicit psum.

The TP recipe for the bottleneck's wide 1x1 layers, with the fused Pallas
GEMM doing the local math (not the jnp fallback):

* reduce conv (Cio -> Cmid), Cio sharded over "model": each device holds an
  activation shard (..., Cio/p) and a weight shard (Cio/p, Cmid), runs the
  fused Pallas GEMM locally with identity BN, then ONE psum over "model"
  reconstitutes the contraction; the folded-BN FMA + ReLU run post-psum
  (they must see the full sum).
* expand conv (Cmid -> Cio), Cio sharded on the OUTPUT: weights are
  column-sharded (Cmid, Cio/p), activations replicated along "model" — no
  collective at all; the BN epilogue is per-output-channel so it fuses
  straight into the local Pallas kernel.

This is the sharding the scaling recipe prescribes: contraction-dim sharding
pays one psum; output-dim sharding pays nothing and leaves the result
sharded for the next layer.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas

_R50_TP_CACHE: dict = {}


def conv1x1_bn_tp_reduce(mesh, x, w, scale, bias, relu: bool = True):
    """Contraction-sharded fused 1x1 conv. x: (N, H, W, Cin) with Cin
    sharded over "model"; w: (Cin, Cout) row-sharded. Output replicated
    along "model", batch-sharded over "data"."""
    cout = w.shape[1]
    ones = jnp.ones((cout,), jnp.float32)
    zeros = jnp.zeros((cout,), jnp.float32)

    def local_fn(x_l, w_l, scale_l, bias_l):
        partial = conv1x1_bn_pallas(x_l, w_l, ones, zeros, relu=False)
        full = jax.lax.psum(partial, "model")
        y = full * scale_l + bias_l
        return jnp.maximum(y, 0.0) if relu else y

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data", None, None, "model"),
            P("model", None),
            P(None),
            P(None),
        ),
        out_specs=P("data", None, None, None),
        check_vma=False,
    )
    return jax.jit(fn)(x, w, scale, bias)


def conv3x3_bn_tp_direct(mesh, x, w9r, scale, bias, relu: bool = True):
    """Tensor-parallel fused 3x3 conv (direct im2col GEMM): input channels
    sharded over "model". x: (N, H, W, Cin) with Cin sharded; w9r: the
    direct-layout filter RESHAPED to (9, Cin, Cout) so P(None, "model",
    None) row-shards each tap's Cin block consistently with the sharded
    im2col. Each device runs the fused Pallas kernel on its shard; ONE
    psum reconstitutes the contraction; BN+ReLU run post-psum."""
    cout = w9r.shape[2]
    ones = jnp.ones((cout,), jnp.float32)
    zeros = jnp.zeros((cout,), jnp.float32)

    def local_fn(x_l, w9_l, scale_l, bias_l):
        from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas

        w9_flat = w9_l.reshape(-1, cout)  # (9 * Cin/p, Cout)
        partial = conv3x3_bn_direct_pallas(x_l, w9_flat, ones, zeros, relu=False)
        full = jax.lax.psum(partial, "model")
        y = full * scale_l + bias_l
        return jnp.maximum(y, 0.0) if relu else y

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data", None, None, "model"),
            P(None, "model", None),
            P(None),
            P(None),
        ),
        out_specs=P("data", None, None, None),
        check_vma=False,
    )
    return jax.jit(fn)(x, w9r, scale, bias)


def bottleneck_block_tp(mesh, x, params):
    """Tensor-parallel bottleneck block over ("data", "model") with ONE
    collective per block (the scaling-recipe composition):

    * reduce 1x1: column-parallel (w_reduce output-sharded) — h1 lands
      sharded over Cmid, no collective;
    * 3x3: row-parallel on the sharded h1 (each device im2cols its Cmid
      shard and contracts against its w9 row block) — one psum;
    * expand 1x1: column-parallel — h3 lands sharded over Cio, no
      collective; the skip add slices the replicated x to the local
      channel shard and the output STAYS channel-sharded (out_specs
      carries the sharding; jit reassembles lazily).

    Every local GEMM is the fused Pallas kernel. params is the standard
    block dict (w9_mid in direct layout); shapes must divide by the
    "model" axis size."""
    n_model = mesh.shape["model"]
    cio, cmid = params["w_reduce"].shape
    assert cmid % n_model == 0 and cio % n_model == 0, (cio, cmid, n_model)
    cio_l = cio // n_model
    w9r = jnp.asarray(params["w9_mid"]).reshape(9, cmid, cmid)
    ones = jnp.ones((cmid,), jnp.float32)
    zeros = jnp.zeros((cmid,), jnp.float32)

    def local_fn(x_l, wr_l, s1_l, b1_l, w9_l, s2, b2, we_l, s3_l, b3_l):
        from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas

        # reduce (column-parallel): fused kernel, sharded BN+ReLU epilogue.
        h1 = conv1x1_bn_pallas(x_l, wr_l, s1_l, b1_l, relu=True)
        # 3x3 (row-parallel): fused kernel on the shard, psum, epilogue.
        partial = conv3x3_bn_direct_pallas(
            h1, w9_l.reshape(-1, cmid), ones, zeros, relu=False
        )
        h2 = jax.lax.psum(partial, "model")
        h2 = jnp.maximum(h2 * s2 + b2, 0.0)
        # expand (column-parallel, NO ReLU) + sharded skip + final ReLU.
        h3 = conv1x1_bn_pallas(h2, we_l, s3_l, b3_l, relu=False)
        idx = jax.lax.axis_index("model")
        x_shard = jax.lax.dynamic_slice_in_dim(x_l, idx * cio_l, cio_l, axis=-1)
        return jnp.maximum(h3 + x_shard, 0.0)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data", None, None, None),      # x replicated along model
            P(None, "model"),                  # w_reduce column-sharded
            P("model"), P("model"),            # s1, b1 sharded with h1
            P(None, "model", None),            # w9 row-sharded (per tap)
            P(None), P(None),                  # s2, b2 replicated
            P(None, "model"),                  # w_expand column-sharded
            P("model"), P("model"),            # s3, b3 sharded with h3
        ),
        out_specs=P("data", None, None, "model"),
        check_vma=False,
    )
    return jax.jit(fn)(
        x,
        jnp.asarray(params["w_reduce"]), jnp.asarray(params["s_reduce"]),
        jnp.asarray(params["b_reduce"]),
        w9r, jnp.asarray(params["s_mid"]), jnp.asarray(params["b_mid"]),
        jnp.asarray(params["w_expand"]), jnp.asarray(params["s_expand"]),
        jnp.asarray(params["b_expand"]),
    )


def resnet_stage_tp(mesh, x, params_list):
    """A whole identity-block STAGE with the block weights sharded over
    "model" — the lever for HBM-bound geometries (ResNet conv5_x streams
    17.8 MB of weights per block; at model=2 each chip streams half).

    One shard_map over the stage; per block (the bottleneck_block_tp
    recipe, chained):
    * reduce 1x1 column-parallel (w_reduce output-sharded) — h1 lands
      Cmid-sharded, no collective;
    * 3x3 row-parallel (w9 row-sharded per tap, fused Pallas kernel on the
      local Cmid shard) — ONE psum over "model" (at 7x7 that moves 100 KB
      of activations vs the 8.9 MB/chip of weight streaming it saves);
    * expand 1x1 column-parallel — h3 lands Cio-sharded, no collective;
      the skip add slices the replicated x;
    * one tiled all_gather re-replicates the block output for the next
      block's reduce (400 KB at conv5_x).

    Weight traffic per chip per block drops from (2*Cio*Cmid + 9*Cmid^2)
    f32 words to 1/p of that; collective traffic is activation-sized and
    rides ICI. x: (N, H, W, Cio) batch-shardable over "data"; every block
    must share (Cio, Cmid) and carry w9_mid."""
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas
    from winograd_tpu.kernels.stage import stack_stage_params

    n_model = mesh.shape["model"]
    n_blocks = len(params_list)
    cio, cmid = params_list[0]["w_reduce"].shape
    assert cmid % n_model == 0 and cio % n_model == 0, (cio, cmid, n_model)
    cio_l = cio // n_model
    stacked = stack_stage_params(params_list)
    w9r = jnp.asarray(stacked["w9_mid"]).reshape(n_blocks, 9, cmid, cmid)
    ones = jnp.ones((cmid,), jnp.float32)
    zeros = jnp.zeros((cmid,), jnp.float32)

    def local_fn(x_l, wr, s1, b1, w9, s2, b2, we, s3, b3):
        idx = jax.lax.axis_index("model")
        for i in range(n_blocks):
            h1 = conv1x1_bn_pallas(x_l, wr[i], s1[i], b1[i], relu=True)
            partial = conv3x3_bn_direct_pallas(
                h1, w9[i].reshape(-1, cmid), ones, zeros, relu=False
            )
            h2 = jax.lax.psum(partial, "model")
            h2 = jnp.maximum(h2 * s2[i] + b2[i], 0.0)
            h3 = conv1x1_bn_pallas(h2, we[i], s3[i], b3[i], relu=False)
            x_shard = jax.lax.dynamic_slice_in_dim(x_l, idx * cio_l, cio_l, axis=-1)
            out_l = jnp.maximum(h3 + x_shard, 0.0)
            x_l = jax.lax.all_gather(out_l, "model", axis=-1, tiled=True)
        return x_l

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data", None, None, None),       # x replicated along model
            P(None, None, "model"),            # w_reduce column-sharded
            P(None, "model"), P(None, "model"),  # s1, b1 sharded with h1
            P(None, None, "model", None),      # w9 row-sharded (per tap)
            P(None, None), P(None, None),      # s2, b2 replicated
            P(None, None, "model"),            # w_expand column-sharded
            P(None, "model"), P(None, "model"),  # s3, b3 sharded with h3
        ),
        out_specs=P("data", None, None, None),
        check_vma=False,
    )
    return jax.jit(fn)(
        x,
        jnp.asarray(stacked["w_reduce"]),
        jnp.asarray(stacked["s_reduce"]).reshape(n_blocks, cmid),
        jnp.asarray(stacked["b_reduce"]).reshape(n_blocks, cmid),
        w9r,
        jnp.asarray(stacked["s_mid"]).reshape(n_blocks, cmid),
        jnp.asarray(stacked["b_mid"]).reshape(n_blocks, cmid),
        jnp.asarray(stacked["w_expand"]),
        jnp.asarray(stacked["s_expand"]).reshape(n_blocks, cio),
        jnp.asarray(stacked["b_expand"]).reshape(n_blocks, cio),
    )


def conv1x1_bn_tp_expand(mesh, x, w, scale, bias, relu: bool = False):
    """Output-sharded fused 1x1 conv. x: (N, H, W, Cmid) replicated along
    "model" (batch-sharded over "data"); w: (Cmid, Cout) column-sharded.
    Output Cout stays sharded over "model" — zero collectives, BN+ReLU fused
    in the local Pallas kernel."""

    def local_fn(x_l, w_l, scale_l, bias_l):
        return conv1x1_bn_pallas(x_l, w_l, scale_l, bias_l, relu=relu)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data", None, None, None),
            P(None, "model"),
            P("model"),
            P("model"),
        ),
        out_specs=P("data", None, None, "model"),
        check_vma=False,
    )
    return jax.jit(fn)(x, w, scale, bias)


def _tp_block_specs(p, n_model):
    """PartitionSpec tree for one block/transition param dict under the
    Megatron recipe: reduce column-parallel, 3x3 row-parallel, expand (and
    projection shortcut) column-parallel. w9_mid is passed reshaped to
    (9, Cmid, Cmid) so its contraction dim shards cleanly."""
    cio, cmid = p["w_reduce"].shape
    assert cmid % n_model == 0 and p["w_expand"].shape[1] % n_model == 0, (
        p["w_reduce"].shape, p["w_expand"].shape, n_model)
    specs = {
        "w_reduce": P(None, "model"),
        "s_reduce": P("model"), "b_reduce": P("model"),
        "w9_mid": P(None, "model", None),
        "s_mid": P(None), "b_mid": P(None),
        "w_expand": P(None, "model"),
        "s_expand": P("model"), "b_expand": P("model"),
    }
    if "w_proj" in p:
        specs.update(
            w_proj=P(None, "model"), s_proj=P("model"), b_proj=P("model")
        )
    return specs


def _tp_block_arrays(p):
    cmid = p["w_reduce"].shape[1]
    keys = ["w_reduce", "s_reduce", "b_reduce", "w9_mid", "s_mid", "b_mid",
            "w_expand", "s_expand", "b_expand"]
    if "w_proj" in p:
        keys += ["w_proj", "s_proj", "b_proj"]
    out = {k: jnp.asarray(p[k]) for k in keys}
    out["w9_mid"] = out["w9_mid"].reshape(9, cmid, cmid)
    return out


def _tp_block_specs_int8(p, n_model):
    """Int8 twin of _tp_block_specs: the quantized matrices shard exactly
    like their f32 twins; per-OUT-channel weight scales ride with the
    output sharding (column-parallel layers) or stay replicated (the
    row-parallel 3x3, whose dequant happens before the psum)."""
    cio, cmid = p["w_reduce"].shape
    assert cmid % n_model == 0 and p["w_expand"].shape[1] % n_model == 0, (
        p["w_reduce"].shape, p["w_expand"].shape, n_model)
    specs = {
        "w_reduce_q": P(None, "model"), "w_reduce_s": P("model"),
        "s_reduce": P("model"), "b_reduce": P("model"),
        "w9_mid_q": P(None, "model", None), "w9_mid_s": P(None),
        "s_mid": P(None), "b_mid": P(None),
        "w_expand_q": P(None, "model"), "w_expand_s": P("model"),
        "s_expand": P("model"), "b_expand": P("model"),
    }
    if "w_proj" in p:
        specs.update(
            w_proj_q=P(None, "model"), w_proj_s=P("model"),
            s_proj=P("model"), b_proj=P("model"),
        )
    return specs


def _tp_block_arrays_int8(p):
    """Quantize one block/transition offline and lay the arrays out for
    the TP specs above (w9 reshaped to (9, Cmid, Cmid) for row sharding)."""
    from winograd_tpu.kernels.quantized import quantize_weights

    cmid = p["w_reduce"].shape[1]
    out = {}
    for key in ("w_reduce", "w9_mid", "w_expand") + (
        ("w_proj",) if "w_proj" in p else ()
    ):
        wq, sw = quantize_weights(np.asarray(p[key]))
        out[f"{key}_q"] = jnp.asarray(wq)
        out[f"{key}_s"] = jnp.asarray(sw)
    out["w9_mid_q"] = out["w9_mid_q"].reshape(9, cmid, cmid)
    for key in ("s_reduce", "b_reduce", "s_mid", "b_mid",
                "s_expand", "b_expand") + (
        ("s_proj", "b_proj") if "w_proj" in p else ()
    ):
        out[key] = jnp.asarray(p[key], jnp.float32)
    return out


def make_resnet50_tp_fn(mesh, params, precision=None):
    """Build a serving fn(x) for the COMPLETE classifier (any depth:
    50/101/152) with EVERY block's weights sharded over "model" — the
    serve-a-model-bigger-than-one-chip (and halve-the-HBM-weight-stream)
    composition, one shard_map over the whole network:

    * stem + maxpool: computed redundantly per model-rank (37 KB of
      weights; sharding it would trade a broadcast for nothing);
    * every bottleneck (projection entry, transitions, identity blocks):
      the Megatron recipe — reduce column-parallel (h1 lands Cmid-sharded),
      3x3 row-parallel (stride 1 via the fused direct kernel, stride 2 via
      strided im2col into the fused pointwise GEMM) with ONE psum, expand
      and projection shortcut column-parallel, skip-add on the local
      channel shard, one tiled all_gather re-replicates for the next
      block's reduce;
    * head: global avgpool local, FC through the fused Pallas GEMM
      (lane-padded classes; a plain XLA dot would run single-pass bf16 on
      the MXU and break the f32 parity bar) — column-parallel when the
      padded class dim divides the model axis (one tiled all_gather of
      logits), replicated otherwise.

    Weight arrays are converted ONCE here (calling the returned fn does no
    host->device re-upload); the jitted program is shared via
    _R50_TP_CACHE. fn(x): x (N, H, W, 3), batch-shardable over "data".
    precision="bf16w" additionally halves the streamed bytes (each local
    fused kernel runs the bf16 weight-storage tier); precision="int8"
    quantizes every block offline and runs the int8 kernels locally —
    quantized matrices shard exactly like their f32 twins, and the
    row-parallel 3x3's per-shard dynamic activation quant dequantizes
    BEFORE the psum, so partial sums compose exactly. params is always
    the f32 forward structure (quantization happens here)."""
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas
    from winograd_tpu.models.downsample import _strided_im2col, _subsample
    from winograd_tpu.models.resnet50 import _class_pad, stem_pallas

    int8 = precision == "int8"
    if int8:
        from winograd_tpu.kernels.quantized import (
            conv1x1_bn_int8_pallas,
            conv3x3_bn_int8_pallas,
            quantize_weights,
        )
    kprec = "bf16w" if precision == "bf16w" else "bf16x3"
    n_model = mesh.shape["model"]
    nc = params["head"]["w_fc"].shape[1]
    pad = _class_pad(nc)
    ncp = nc + pad
    # The int8 head FC stays replicated (2 MB of int8 weights at
    # ResNet-50 scale; sharding it would save nothing measurable).
    shard_head = ncp % n_model == 0 and not int8

    mk_arrays = _tp_block_arrays_int8 if int8 else _tp_block_arrays
    mk_specs = _tp_block_specs_int8 if int8 else _tp_block_specs
    blocks = [dict(mk_arrays(params["proj"]), _stride=1)]
    specs = [dict(mk_specs(params["proj"], n_model), _stride=None)]
    for st in params["stages"]:
        if st.get("transition") is not None:
            blocks.append(dict(mk_arrays(st["transition"]), _stride=2))
            specs.append(
                dict(mk_specs(st["transition"], n_model), _stride=None)
            )
        for b in st["blocks"]:
            blocks.append(dict(mk_arrays(b), _stride=0))
            specs.append(dict(mk_specs(b, n_model), _stride=None))
    strides = [b.pop("_stride") for b in blocks]
    for s in specs:
        s.pop("_stride")

    stem_arrays = {k: jnp.asarray(v) for k, v in params["stem"].items()}
    if int8:
        wq, sw = quantize_weights(np.asarray(params["head"]["w_fc"]))
        head_arrays = {
            "w_fc_q": jnp.pad(jnp.asarray(wq), ((0, 0), (0, pad))),
            "w_fc_s": jnp.pad(jnp.asarray(sw), ((0, pad),), constant_values=1.0),
            "s_fc": jnp.ones((ncp,), jnp.float32),
            "b_fc": jnp.pad(
                jnp.asarray(params["head"]["b_fc"], jnp.float32), ((0, pad),)
            ),
        }
    else:
        head_arrays = {
            "w_fc": jnp.pad(
                jnp.asarray(params["head"]["w_fc"], jnp.float32),
                ((0, 0), (0, pad)),
            ),
            "s_fc": jnp.ones((ncp,), jnp.float32),
            "b_fc": jnp.pad(
                jnp.asarray(params["head"]["b_fc"], jnp.float32), ((0, pad),)
            ),
        }
    stem_specs = {k: P() for k in stem_arrays}
    head_specs = (
        {"w_fc": P(None, "model"), "s_fc": P("model"), "b_fc": P("model")}
        if shard_head
        else {k: P() for k in head_arrays}
    )

    if int8:
        # Tier adapters: same call sites, int8 kernels. The quantized
        # matrices carry a "_q" suffix plus a per-out-channel "_s" scale.
        def k1x1(a, bp, key, s, b, relu):
            return conv1x1_bn_int8_pallas(
                a, bp[f"{key}_q"], bp[f"{key}_s"], s, b, relu
            )

        def kmid(a, w9_l, w9s, cmid, stride):
            if stride == 2:
                return conv1x1_bn_int8_pallas(
                    _strided_im2col(a), w9_l, w9s,
                    jnp.ones((cmid,), jnp.float32),
                    jnp.zeros((cmid,), jnp.float32), False,
                )
            return conv3x3_bn_int8_pallas(
                a, w9_l, w9s, jnp.ones((cmid,), jnp.float32),
                jnp.zeros((cmid,), jnp.float32), relu=False,
            )

        def khead(pooled, head_p):
            return conv1x1_bn_int8_pallas(
                pooled, head_p["w_fc_q"], head_p["w_fc_s"],
                head_p["s_fc"], head_p["b_fc"], False,
            )
    else:

        def k1x1(a, bp, key, s, b, relu):
            return conv1x1_bn_pallas(a, bp[key], s, b, relu=relu,
                                     precision=kprec)

        def kmid(a, w9_l, w9s, cmid, stride):
            ones = jnp.ones((cmid,), jnp.float32)
            zeros = jnp.zeros((cmid,), jnp.float32)
            if stride == 2:
                return conv1x1_bn_pallas(
                    _strided_im2col(a), w9_l, ones, zeros, relu=False,
                    precision=kprec,
                )
            return conv3x3_bn_direct_pallas(
                a, w9_l, ones, zeros, relu=False, precision=kprec
            )

        def khead(pooled, head_p):
            return conv1x1_bn_pallas(
                pooled, head_p["w_fc"], head_p["s_fc"], head_p["b_fc"],
                relu=False, precision=kprec,
            )

    we_key = "w_expand_q" if int8 else "w_expand"
    w9_key = "w9_mid_q" if int8 else "w9_mid"

    def local_fn(x_l, stem_p, blocks_p, head_p):
        idx = jax.lax.axis_index("model")
        h = stem_pallas(x_l, stem_p, precision)
        for bp, stride in zip(blocks_p, strides):
            cmid = bp["s_mid"].shape[0]
            cout_l = bp[we_key].shape[1]  # local shard
            h1 = k1x1(h, bp, "w_reduce", bp["s_reduce"], bp["b_reduce"], True)
            w9_l = bp[w9_key].reshape(-1, cmid)
            partial = kmid(h1, w9_l, bp.get("w9_mid_s"), cmid, stride)
            h2 = jax.lax.psum(partial, "model")
            h2 = jnp.maximum(h2 * bp["s_mid"] + bp["b_mid"], 0.0)
            h3 = k1x1(h2, bp, "w_expand", bp["s_expand"], bp["b_expand"], False)
            if ("w_proj" in bp) or ("w_proj_q" in bp):
                xs = _subsample(h) if stride == 2 else h
                skip = k1x1(xs, bp, "w_proj", bp["s_proj"], bp["b_proj"], False)
            else:
                skip = jax.lax.dynamic_slice_in_dim(
                    h, idx * cout_l, cout_l, axis=-1
                )
            out_l = jnp.maximum(h3 + skip, 0.0)
            h = jax.lax.all_gather(out_l, "model", axis=-1, tiled=True)
        pooled = h.mean(axis=(-3, -2))
        logits = khead(pooled, head_p)
        if shard_head:
            logits = jax.lax.all_gather(logits, "model", axis=-1, tiled=True)
        return logits[..., :nc]

    # Memoize the jitted program per (mesh, block structure) — a fresh jit
    # wrapper per build would re-trace the whole network for every engine
    # (same pattern as pipeline._R50_PIPE_CACHE). jit itself keys on x's
    # shape, so one cached wrapper covers all batch sizes.
    key = (
        mesh,
        tuple(strides),
        shard_head,
        precision,
        nc,
        tuple(sorted(stem_arrays)),
        tuple(
            (tuple(sorted(b)),) + tuple(b[k].shape for k in sorted(b))
            for b in blocks
        ),
    )
    jitted = _R50_TP_CACHE.get(key)
    if jitted is None:
        jitted = _R50_TP_CACHE[key] = jax.jit(
            shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(
                    P("data", None, None, None), stem_specs, specs, head_specs
                ),
                out_specs=P("data", None),
                check_vma=False,
            )
        )

    def fn(x):
        return jitted(
            jnp.asarray(x, jnp.float32), stem_arrays, blocks, head_arrays
        )

    return fn


def resnet50_forward_tp(mesh, params, x, precision=None):
    """One-shot convenience wrapper over make_resnet50_tp_fn (which is the
    serving form: it converts the weight arrays once and returns a fn(x)
    that does no per-call host->device re-upload)."""
    return make_resnet50_tp_fn(mesh, params, precision)(x)


_BASIC_TP_CACHE: dict = {}


def _basic_tp_arrays(p, int8: bool):
    """Lay one BASIC block's arrays out for TP: w9_a stays (9*Cin, Cout)
    (column-sharded on the output), w9_b reshaped to (9, C, C) so its
    contraction dim row-shards per tap (matching the local im2col of a
    channel-sharded activation). int8 quantizes offline (per-out-channel
    scales ride with each matrix)."""
    c = p["s_b"].shape[0]
    out = {}
    if int8:
        from winograd_tpu.kernels.quantized import quantize_weights

        for key in ("w9_a", "w9_b") + (("w_proj",) if "w_proj" in p else ()):
            wq, sw = quantize_weights(np.asarray(p[key]))
            out[f"{key}_q"] = jnp.asarray(wq)
            out[f"{key}_s"] = jnp.asarray(sw)
        out["w9_b_q"] = out["w9_b_q"].reshape(9, c, c)
    else:
        out["w9_a"] = jnp.asarray(p["w9_a"])
        out["w9_b"] = jnp.asarray(p["w9_b"]).reshape(9, c, c)
        if "w_proj" in p:
            out["w_proj"] = jnp.asarray(p["w_proj"])
    for key in ("s_a", "b_a", "s_b", "b_b") + (
        ("s_proj", "b_proj") if "w_proj" in p else ()
    ):
        out[key] = jnp.asarray(p[key], jnp.float32)
    return out


def _basic_tp_specs(p, n_model, int8: bool):
    """PartitionSpec tree for one BASIC block under the Megatron recipe:
    conv a column-parallel (output-sharded, BN rides the shard), conv b
    row-parallel (ONE psum per block; BN post-psum), projection shortcut
    replicated (Cin*Cout words — an order under the 9*C^2 3x3s)."""
    c = p["s_b"].shape[0]
    assert c % n_model == 0, (c, n_model)
    if int8:
        specs = {
            "w9_a_q": P(None, "model"), "w9_a_s": P("model"),
            "s_a": P("model"), "b_a": P("model"),
            "w9_b_q": P(None, "model", None), "w9_b_s": P(None),
            "s_b": P(None), "b_b": P(None),
        }
        if "w_proj" in p:
            specs.update(
                w_proj_q=P(), w_proj_s=P(), s_proj=P(), b_proj=P()
            )
    else:
        specs = {
            "w9_a": P(None, "model"),
            "s_a": P("model"), "b_a": P("model"),
            "w9_b": P(None, "model", None),
            "s_b": P(None), "b_b": P(None),
        }
        if "w_proj" in p:
            specs.update(w_proj=P(), s_proj=P(), b_proj=P())
    return specs


def make_basicnet_tp_fn(mesh, params, precision=None):
    """Build a serving fn(x) for the COMPLETE BASIC-block classifier
    (ResNet-18/34) with every block's 3x3 weights sharded over "model" —
    the basic-family twin of make_resnet50_tp_fn. The Megatron recipe per
    BASIC block is the two-GEMM pair itself:

    * conv a (3x3, or strided im2col GEMM on entry blocks): COLUMN-parallel
      — w9_a output-sharded, BN+ReLU epilogue rides the shard, h1 lands
      C/p-sharded with NO collective;
    * conv b (3x3): ROW-parallel — each rank im2cols its h1 channel shard
      locally and contracts against its (9, C/p, C) row block of w9_b;
      ONE psum per block reconstitutes the contraction, BN runs post-psum;
    * skip add + final ReLU on the replicated sum — the block output is
      already replicated, so unlike the bottleneck recipe there is NO
      all_gather anywhere;
    * stride-2 entry blocks: the projection shortcut (Cin*Cout words, an
      order of magnitude under the 9*C^2 3x3s) computes replicated;
    * stem replicated per rank (37 KB); head column-parallel when the
      lane-padded class dim divides the model axis (one tiled all_gather
      of logits), replicated otherwise.

    Per-rank 3x3 weight bytes drop to 1/p; collective traffic is one
    activation-sized psum per block over ICI. precision="bf16w" halves the
    streamed bytes (local kernels run the bf16 weight-storage tier);
    precision="int8" quantizes offline and runs the int8 kernels locally —
    the row-parallel conv b dequantizes per shard BEFORE the psum, so
    partial sums compose exactly. params is the models/basic.py forward
    structure; weight arrays convert ONCE here."""
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas
    from winograd_tpu.models.downsample import _strided_im2col, _subsample
    from winograd_tpu.models.resnet50 import _class_pad, stem_pallas

    int8 = precision == "int8"
    if int8:
        from winograd_tpu.kernels.quantized import (
            conv1x1_bn_int8_pallas,
            conv3x3_bn_int8_pallas,
            quantize_weights,
        )
    kprec = "bf16w" if precision == "bf16w" else "bf16x3"
    n_model = mesh.shape["model"]
    nc = params["head"]["w_fc"].shape[1]
    pad = _class_pad(nc)
    ncp = nc + pad
    shard_head = ncp % n_model == 0 and not int8

    blocks, specs, strides = [], [], []
    for st in params["stages"]:
        if st.get("entry") is not None:
            blocks.append(_basic_tp_arrays(st["entry"], int8))
            specs.append(_basic_tp_specs(st["entry"], n_model, int8))
            strides.append(2)
        for b in st["blocks"]:
            blocks.append(_basic_tp_arrays(b, int8))
            specs.append(_basic_tp_specs(b, n_model, int8))
            strides.append(0)

    stem_arrays = {k: jnp.asarray(v) for k, v in params["stem"].items()}
    if int8:
        wq, sw = quantize_weights(np.asarray(params["head"]["w_fc"]))
        head_arrays = {
            "w_fc_q": jnp.pad(jnp.asarray(wq), ((0, 0), (0, pad))),
            "w_fc_s": jnp.pad(jnp.asarray(sw), ((0, pad),), constant_values=1.0),
            "s_fc": jnp.ones((ncp,), jnp.float32),
            "b_fc": jnp.pad(
                jnp.asarray(params["head"]["b_fc"], jnp.float32), ((0, pad),)
            ),
        }
    else:
        head_arrays = {
            "w_fc": jnp.pad(
                jnp.asarray(params["head"]["w_fc"], jnp.float32),
                ((0, 0), (0, pad)),
            ),
            "s_fc": jnp.ones((ncp,), jnp.float32),
            "b_fc": jnp.pad(
                jnp.asarray(params["head"]["b_fc"], jnp.float32), ((0, pad),)
            ),
        }
    stem_specs = {k: P() for k in stem_arrays}
    head_specs = (
        {"w_fc": P(None, "model"), "s_fc": P("model"), "b_fc": P("model")}
        if shard_head
        else {k: P() for k in head_arrays}
    )

    if int8:

        def conv_a(a, bp, stride):
            if stride == 2:
                return conv1x1_bn_int8_pallas(
                    _strided_im2col(a), bp["w9_a_q"], bp["w9_a_s"],
                    bp["s_a"], bp["b_a"], True,
                )
            return conv3x3_bn_int8_pallas(
                a, bp["w9_a_q"], bp["w9_a_s"], bp["s_a"], bp["b_a"], relu=True
            )

        def conv_b_partial(h1_l, bp, c):
            return conv3x3_bn_int8_pallas(
                h1_l, bp["w9_b_q"].reshape(-1, c), bp["w9_b_s"],
                jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                relu=False,
            )

        def conv_proj(a, bp):
            return conv1x1_bn_int8_pallas(
                a, bp["w_proj_q"], bp["w_proj_s"], bp["s_proj"], bp["b_proj"],
                False,
            )

        def khead(pooled, head_p):
            return conv1x1_bn_int8_pallas(
                pooled, head_p["w_fc_q"], head_p["w_fc_s"],
                head_p["s_fc"], head_p["b_fc"], False,
            )
    else:

        def conv_a(a, bp, stride):
            if stride == 2:
                return conv1x1_bn_pallas(
                    _strided_im2col(a), bp["w9_a"], bp["s_a"], bp["b_a"],
                    relu=True, precision=kprec,
                )
            return conv3x3_bn_direct_pallas(
                a, bp["w9_a"], bp["s_a"], bp["b_a"], relu=True, precision=kprec
            )

        def conv_b_partial(h1_l, bp, c):
            return conv3x3_bn_direct_pallas(
                h1_l, bp["w9_b"].reshape(-1, c),
                jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                relu=False, precision=kprec,
            )

        def conv_proj(a, bp):
            return conv1x1_bn_pallas(
                a, bp["w_proj"], bp["s_proj"], bp["b_proj"], relu=False,
                precision=kprec,
            )

        def khead(pooled, head_p):
            return conv1x1_bn_pallas(
                pooled, head_p["w_fc"], head_p["s_fc"], head_p["b_fc"],
                relu=False, precision=kprec,
            )

    proj_key = "w_proj_q" if int8 else "w_proj"

    def local_fn(x_l, stem_p, blocks_p, head_p):
        h = stem_pallas(x_l, stem_p, precision)
        for bp, stride in zip(blocks_p, strides):
            c = bp["s_b"].shape[0]
            h1_l = conv_a(h, bp, stride)
            h2 = jax.lax.psum(conv_b_partial(h1_l, bp, c), "model")
            h2 = h2 * bp["s_b"] + bp["b_b"]
            skip = conv_proj(_subsample(h), bp) if proj_key in bp else h
            h = jnp.maximum(h2 + skip, 0.0)
        pooled = h.mean(axis=(-3, -2))
        logits = khead(pooled, head_p)
        if shard_head:
            logits = jax.lax.all_gather(logits, "model", axis=-1, tiled=True)
        return logits[..., :nc]

    key = (
        mesh,
        tuple(strides),
        shard_head,
        precision,
        nc,
        tuple(sorted(stem_arrays)),
        tuple(
            (tuple(sorted(b)),) + tuple(b[k].shape for k in sorted(b))
            for b in blocks
        ),
    )
    jitted = _BASIC_TP_CACHE.get(key)
    if jitted is None:
        jitted = _BASIC_TP_CACHE[key] = jax.jit(
            shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(
                    P("data", None, None, None), stem_specs, specs, head_specs
                ),
                out_specs=P("data", None),
                check_vma=False,
            )
        )

    def fn(x):
        return jitted(
            jnp.asarray(x, jnp.float32), stem_arrays, blocks, head_arrays
        )

    return fn


def basicnet_forward_tp(mesh, params, x, precision=None):
    """One-shot convenience wrapper over make_basicnet_tp_fn."""
    return make_basicnet_tp_fn(mesh, params, precision)(x)

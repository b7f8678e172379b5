"""Differentiable wrappers: fused Pallas forward + custom XLA backward.

The reference is inference-only ("no training related operations",
report.pdf §1). A deployable TPU framework wants gradients, so the fused
kernels get custom VJPs (the pattern in the Pallas guide): the FORWARD pass
runs the single fused Pallas kernel; the BACKWARD pass runs the layer
transposes — dx of stride-1 3x3s through the SAME fused F(2,3) Pallas
kernel (the winograd algebra's 2.25x MAC saving applies to the data
gradient too), the rest as XLA GEMM transposes. The pre-BN activation z
that d(scale) needs is RECOVERED algebraically from the fused output
(z = (y - bias)/scale, exact wherever the ReLU-masked gradient is
nonzero) instead of rematerialized by an extra conv/GEMM — the layer
VJPs store only (x, y) like a plain remat scheme but pay zero recompute
for z.

Parameterization is by the RAW weights (w, gamma-folded scale/bias): the
offline Winograd filter transform G g G^T is itself a fixed linear map, so
it is applied inside the traced forward (differentiable, fused by XLA into
the step) — the trained w is exported and re-transformed offline for
deployment, preserving the reference's artifact contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from winograd_tpu.kernels import transforms
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas

_HI = jax.lax.Precision.HIGHEST

# Backward/remat precision. Gradients are bounded by the train-step
# agreement check at 1e-3 relative — they do not need f32. HIGH
# (bf16x3-class, ~1e-4 per GEMM) halves the MXU passes of the
# rematerializing backward vs HIGHEST's 6-pass f32; measured v5e mode 17:
# the megakernel-forward train step at a HIGHEST backward LOSES to the
# all-XLA HIGHEST autodiff step (1594 vs 1418 us — remat re-runs a 6-pass
# forward), and the HIGH backward is the lever that flips it. The FORWARD
# stays the strict serving path (1e-4 parity) in both steps.
BWD_PRECISION = jax.lax.Precision.HIGH

# Weight-gradient (dw) accumulation precision; None means "follow
# BWD_PRECISION". Split out because the measured precision ladder (v5e
# mode 17, tools/exp_gradleaf.py) shows the dw reductions are where
# single-pass bf16 hurts: all-DEFAULT backward's worst per-leaf grad error
# is 4.3e-3 (at a 1x1 dw leaf) vs 2.6e-4 all-HIGH, while the step is only
# ~11% faster (915 vs 1071 us) — the scalar train_grad_rel_error aggregate
# (~5e-6 both) hides it. HIGH everywhere is the accuracy/speed point we
# ship; the knobs stay for measurement.
DW_PRECISION: jax.lax.Precision | None = None


def _dw_prec():
    return BWD_PRECISION if DW_PRECISION is None else DW_PRECISION


def _prec_kw(precision: str | None):
    """Forward-tier plumbing: None = the serving kernel's own default (the
    strict-parity f32 route); "bf16w" = the bf16 weight-STORAGE tier (the
    kernels downcast the streamed weight matrices in-trace, so the f32
    master weights stay the trainable leaves and the half-bytes forward is
    exactly the bf16w kernel serving runs). The BACKWARD always runs the
    f32/HIGH math — only the forward (and the saved y it masks/recovers z
    from) changes tier."""
    return {} if precision is None else {"precision": precision}


def filter_transform_jnp(w: jax.Array, m: int = 4) -> jax.Array:
    """Differentiable G g G^T: (Cout, Cin, 3, 3) -> (a^2, Cin, Cout)."""
    g = jnp.asarray(transforms.matrices(m)[1], jnp.float32)
    a = transforms.alpha(m)
    u = jnp.einsum("ar,oirs,bs->aboi", g, w, g, precision=_HI)
    cout, cin = w.shape[0], w.shape[1]
    return u.reshape(a * a, cout, cin).transpose(0, 2, 1)


def stem_filter_s2d_jnp(w7: jax.Array) -> jax.Array:
    """Differentiable stem s2d GEMM layout (the in-trace twin of
    models/resnet50.py::stem_filter_s2d): (Cout, Cin, 7, 7) OIHW ->
    (64*Cin, Cout), a fixed pad + permutation so grads flow to w7."""
    cout, cin = w7.shape[0], w7.shape[1]
    wt = jnp.transpose(w7, (2, 3, 1, 0))  # (7, 7, cin, cout)
    wt = jnp.pad(wt, ((0, 1), (0, 1), (0, 0), (0, 0)))  # taps 7 are zeros
    w = wt.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(64 * cin, cout)


# --- pointwise ---------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv1x1_bn_train(x, w, scale, bias, relu: bool, precision: str | None = None):
    """Differentiable fused 1x1 conv + BN (+ReLU); Pallas forward.
    precision="bf16w" runs the bf16 weight-storage serving tier as the
    forward (f32 master w; the kernel downcasts the streamed copy)."""
    return conv1x1_bn_pallas(x, w, scale, bias, relu, **_prec_kw(precision))


def _recover_z(y, scale, bias):
    """Pre-BN activation recovered from the fused output: z = (y-bias)/scale.
    Replaces the z-rematerializing conv/GEMM the backward used to run —
    d(scale) only needs z where the (ReLU-masked) gradient is nonzero, and
    there y = z*scale + bias holds exactly: with relu, masked grads are
    zero wherever y <= 0, so the junk recovered there multiplies 0; without
    relu it is exact everywhere. Assumes the folded BN scale is nonzero
    (guarded against 0 to avoid NaN poisoning; a transiently-zero trained
    scale would zero that channel's d(scale) contribution anyway since
    y = bias there only when z*scale = 0)."""
    s = jnp.where(scale == 0.0, 1.0, scale)
    return (y - bias) / s


def _pw_fwd(x, w, scale, bias, relu, precision):
    y = conv1x1_bn_pallas(x, w, scale, bias, relu, **_prec_kw(precision))
    return y, (x, w, scale, bias, y)


def _pw_bwd(relu, precision, res, g):
    x, w, scale, bias, y = res
    if relu:
        g = jnp.where(y > 0, g, 0.0)
    z = _recover_z(y, scale, bias)
    gs = g * scale
    lead = tuple(range(x.ndim - 1))
    dx = jnp.dot(gs, w.T, preferred_element_type=jnp.float32, precision=BWD_PRECISION)
    dw = jnp.tensordot(
        x, gs, axes=(lead, lead), precision=_dw_prec()
    ).astype(w.dtype)
    dscale = jnp.sum(z * g, axis=lead)
    dbias = jnp.sum(g, axis=lead)
    return dx, dw, dscale, dbias


conv1x1_bn_train.defvjp(_pw_fwd, _pw_bwd)


# --- 3x3 winograd ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv3x3_bn_winograd_train(x, w, scale, bias, relu: bool = True, m: int = 4,
                              precision: str | None = None):
    """Differentiable fused 3x3 Winograd conv + BN (+ReLU); Pallas forward.

    w is the RAW (Cout, Cin, 3, 3) filter; the Winograd transform runs
    inside the trace (filter_transform_jnp). precision="bf16w" downcasts
    the transformed filter to bfloat16 in-trace — the exact bf16w serving
    kernel as the training forward, f32 master w as the trainable leaf.
    """
    u = filter_transform_jnp(w, m)
    return conv3x3_bn_winograd_pallas(x, u, scale, bias, relu, **_prec_kw(precision))


def _wg_fwd(x, w, scale, bias, relu, m, precision):
    u = filter_transform_jnp(w, m)
    y = conv3x3_bn_winograd_pallas(x, u, scale, bias, relu, **_prec_kw(precision))
    return y, (x, w, scale, bias, y)


def _conv3x3_dw(x, gs):
    """dw[o,c,r,s] = sum_{n,i,j} gs[n,i,j,o] * xpad[n,i+r,j+s,c] — nine
    shifted-patch einsums at the dw precision; returns (O, C, 3, 3)."""
    x4 = x if x.ndim == 4 else x[None]
    g4 = gs if gs.ndim == 4 else gs[None]
    h, wd = x4.shape[1], x4.shape[2]
    xpad = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw_parts = []
    for r in range(3):
        row = []
        for s in range(3):
            patch = xpad[:, r : r + h, s : s + wd, :]
            row.append(
                jnp.einsum("nijo,nijc->oc", g4, patch, precision=_dw_prec())
            )
        dw_parts.append(row)
    return jnp.stack([jnp.stack(row, axis=-1) for row in dw_parts], axis=-2)


def _bn_grads(y, scale, bias, g):
    z = _recover_z(y, scale, bias)
    lead = tuple(range(g.ndim - 1))
    return jnp.sum(z * g, axis=lead), jnp.sum(g, axis=lead)


def _wg_bwd(relu, m, precision, res, g):
    x, w, scale, bias, y = res
    if relu:
        g = jnp.where(y > 0, g, 0.0)
    gs = g * scale
    # dx: correlate gs with the spatially-flipped, channel-transposed
    # filter — through the SAME fused F(2,3) Pallas kernel the forward
    # uses (identity BN epilogue), not XLA's direct conv: 2.25x fewer MACs
    # and bf16x3 (~2e-5) is tighter than the direct conv at HIGH (~1e-4).
    w_t = jnp.transpose(w[:, :, ::-1, ::-1], (1, 0, 2, 3))  # (Cin, Cout, 3, 3)
    cin = w.shape[1]
    dx = conv3x3_bn_winograd_pallas(
        gs,
        filter_transform_jnp(w_t, 2),
        jnp.ones((cin,), jnp.float32),
        jnp.zeros((cin,), jnp.float32),
        relu=False,
    )
    dw = _conv3x3_dw(x, gs)
    dscale, dbias = _bn_grads(y, scale, bias, g)
    return dx, dw.astype(w.dtype), dscale, dbias


conv3x3_bn_winograd_train.defvjp(_wg_fwd, _wg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_bn_direct_train(x, w, scale, bias, relu: bool = True,
                            precision: str | None = None):
    """Differentiable fused 3x3 conv + BN (+ReLU) through the DIRECT
    im2col-GEMM Pallas kernel (kernels/direct.py) — the train twin of the
    small-map serving route (models/basic.py::_conv3x3): at 7x7x512 the
    F(2,3) filter layout is 16/9x the direct layout's bytes (16.8 vs
    9.4 MB streamed per step), so winograd LOSES there (measured 27.5 vs
    16.2 us f32, tools/exp_basicroute.py). w is the RAW (Cout, Cin, 3, 3)
    filter; the im2col layout is built in-trace (direct_filter) so
    gradients flow to the raw filter."""
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter

    return conv3x3_bn_direct_pallas(
        x, direct_filter(w), scale, bias, relu, **_prec_kw(precision)
    )


def _dg_fwd(x, w, scale, bias, relu, precision):
    y = conv3x3_bn_direct_train(x, w, scale, bias, relu, precision)
    return y, (x, w, scale, bias, y)


def _dg_bwd(relu, precision, res, g):
    from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter

    x, w, scale, bias, y = res
    if relu:
        g = jnp.where(y > 0, g, 0.0)
    gs = g * scale
    w_t = jnp.transpose(w[:, :, ::-1, ::-1], (1, 0, 2, 3))  # (Cin, Cout, 3, 3)
    cin = w.shape[1]
    dx = conv3x3_bn_direct_pallas(
        gs,
        direct_filter(w_t),
        jnp.ones((cin,), jnp.float32),
        jnp.zeros((cin,), jnp.float32),
        relu=False,
    )
    dw = _conv3x3_dw(x, gs)
    dscale, dbias = _bn_grads(y, scale, bias, g)
    return dx, dw.astype(w.dtype), dscale, dbias


conv3x3_bn_direct_train.defvjp(_dg_fwd, _dg_bwd)


# --- fused stem ----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def stem_train_fused(x, params, precision: str | None = None):
    """Differentiable ResNet stem whose FORWARD is the single fused Pallas
    stem kernel (kernels/stem.py: s2d patch GEMMs + BN + ReLU + row-pooled
    maxpool) — the trained forward IS the served forward. params carries
    the RAW {w7_stem, s_stem, b_stem}; the s2d GEMM layout is a fixed
    pad+permutation applied in-trace (stem_filter_s2d_jnp) so gradients
    flow to the OIHW filter. BACKWARD is XLA autodiff of the identical
    math (the s2d patch-matrix GEMM + maxpool), rematerialized at
    BWD_PRECISION."""
    return _stem_fused_forward(x, params, precision)


def _stem_fused_forward(x, params, precision=None):
    from winograd_tpu.kernels.stem import stem_fused_pallas

    return stem_fused_pallas(
        x,
        stem_filter_s2d_jnp(params["w7_stem"]),
        params["s_stem"],
        params["b_stem"],
        **_prec_kw(precision),
    )


def _stem_math(x, params):
    """The backward's subject: the same s2d patch matrix, the conv+BN+ReLU
    GEMM through the fused-pointwise TRAIN wrapper (Pallas remat + its
    fast custom backward with algebraic z recovery), then the maxpool
    (XLA select-and-scatter autodiff)."""
    from winograd_tpu.models.resnet50 import _stem_s2d_cols
    from winograd_tpu.ops import jnp_ops

    cols = _stem_s2d_cols(x)
    w = stem_filter_s2d_jnp(params["w7_stem"])
    h = conv1x1_bn_train(cols, w, params["s_stem"], params["b_stem"], True)
    return jnp_ops.maxpool3x3_s2(h)


def _stem_fwd(x, params, precision):
    return _stem_fused_forward(x, params, precision), (x, params)


def _stem_bwd(precision, res, g):
    x, params = res
    _, vjp_fn = jax.vjp(_stem_math, x, params)
    return vjp_fn(g)


stem_train_fused.defvjp(_stem_fwd, _stem_bwd)


# --- whole-block megakernel ---------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bottleneck_block_train_fused(x, params, precision: str | None = None):
    """Differentiable bottleneck block whose FORWARD is the single fused
    Pallas megakernel (kernels/block.py) — the trained forward IS the
    served forward. params carries the RAW w_mid (Cout, Cin, 3, 3); the
    direct im2col filter layout is a fixed permutation applied inside the
    trace (like the Winograd transform in conv3x3_bn_winograd_train).

    BACKWARD differentiates the per-layer train composition (the layer
    wrappers above), rematerializing intermediates through the fused
    Pallas kernels — the mid conv's remat AND data gradient ride the
    F(2,3) algebra, z is recovered algebraically. Gradients match the
    XLA-baseline autodiff (tests/test_vjp.py asserts to 1e-4)."""
    return _block_fused_forward(x, params, precision)


def _block_fused_forward(x, params, precision=None):
    from winograd_tpu.kernels.block import bottleneck_block_fused_pallas
    from winograd_tpu.kernels.direct import direct_filter

    kp = dict(params)
    kp["w9_mid"] = direct_filter(params["w_mid"])
    # Both offline filter layouts are fixed linear maps — derived in-trace
    # so the megakernel's mid-algo auto-select (winograd2 on large maps)
    # applies to the training forward exactly as it does in serving.
    kp["u2_mid"] = filter_transform_jnp(params["w_mid"], m=2)
    return bottleneck_block_fused_pallas(x, kp, **_prec_kw(precision))


def _block_fwd(x, params, precision):
    return _block_fused_forward(x, params, precision), (x, params)


def _block_bwd(precision, res, g):
    # Differentiate the PER-LAYER train composition instead of the plain
    # XLA math: the layer wrappers' custom VJPs rematerialize the mid conv
    # through the fused F(2,3) Pallas kernel and run its data gradient
    # through the same algebra (2.25x fewer MACs than the direct-conv
    # autodiff both ways), with z recovered algebraically per layer.
    def math(x_, p_):
        h = conv1x1_bn_train(
            x_, p_["w_reduce"], p_["s_reduce"], p_["b_reduce"], True
        )
        h = conv3x3_bn_winograd_train(
            h, p_["w_mid"], p_["s_mid"], p_["b_mid"], True, 2
        )
        h = conv1x1_bn_train(
            h, p_["w_expand"], p_["s_expand"], p_["b_expand"], False
        )
        return jnp.maximum(h + x_, 0.0)

    x, params = res
    _, vjp_fn = jax.vjp(math, x, params)
    return vjp_fn(g)


bottleneck_block_train_fused.defvjp(_block_fwd, _block_bwd)


# --- stride-2 transition megakernel -------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def transition_block_train_fused(x, params, precision: str | None = None):
    """Differentiable stride-2 transition block whose FORWARD is the fused
    Pallas transition megakernel (kernels/transition.py) — with
    bottleneck_block_train_fused this makes the ENTIRE backbone trainable
    through the same kernels serving runs. params carries the RAW w_mid
    (Cmid, Cmid, 3, 3); the direct im2col layout is a fixed permutation
    applied in-trace. BACKWARD differentiates the per-layer composition
    (GEMMs through the Pallas pointwise train wrapper; the strided mid —
    which has no winograd form — as im2col into the same wrapper)."""
    return _transition_fused_forward(x, params, precision)


def _transition_fused_forward(x, params, precision=None):
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.kernels.transition import transition_block_fused_pallas

    kp = dict(params)
    kp["w9_mid"] = direct_filter(params["w_mid"])
    return transition_block_fused_pallas(x, kp, **_prec_kw(precision))


def _transition_fwd(x, params, precision):
    return _transition_fused_forward(x, params, precision), (x, params)


def _transition_bwd(precision, res, g):
    # Per-layer composition: the three GEMMs (reduce, expand, projection)
    # remat through the Pallas pointwise train wrapper (fast backward,
    # algebraic z recovery); the STRIDED mid conv has no winograd form, so
    # it runs as strided im2col into the same wrapper with the direct
    # filter layout derived in-trace (gradients flow to the raw w_mid) —
    # the identical math the serving transition kernel computes.
    def math(x_, p_):
        from winograd_tpu.kernels.direct import direct_filter
        from winograd_tpu.models.downsample import _strided_im2col, _subsample

        h = conv1x1_bn_train(
            x_, p_["w_reduce"], p_["s_reduce"], p_["b_reduce"], True
        )
        cols = _strided_im2col(h)
        h = conv1x1_bn_train(
            cols, direct_filter(p_["w_mid"]), p_["s_mid"], p_["b_mid"], True
        )
        h = conv1x1_bn_train(
            h, p_["w_expand"], p_["s_expand"], p_["b_expand"], False
        )
        skip = conv1x1_bn_train(
            _subsample(x_), p_["w_proj"], p_["s_proj"], p_["b_proj"], False
        )
        return jnp.maximum(h + skip, 0.0)

    x, params = res
    _, vjp_fn = jax.vjp(math, x, params)
    return vjp_fn(g)


transition_block_train_fused.defvjp(_transition_fwd, _transition_bwd)


# --- stride-1 projection block (conv2_x's entry) -------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def projection_block_train_fused(x, params, precision: str | None = None):
    """Differentiable stride-1 PROJECTION bottleneck (conv2_x's entry in
    the full classifier) whose FORWARD runs the serving composition
    (models/downsample.py::projection_bottleneck_block_pallas, with the
    F(2,3) filter layout derived in-trace from the raw w_mid). BACKWARD
    differentiates the per-layer train composition (see _block_bwd)."""
    return _projection_fused_forward(x, params, precision)


def _projection_fused_forward(x, params, precision=None):
    from winograd_tpu.models.downsample import projection_bottleneck_block_pallas

    kp = dict(params)
    # 56x56 map: the F(2,3) Winograd algebra is the measured winner there.
    kp["u2_mid"] = filter_transform_jnp(params["w_mid"], m=2)
    return projection_bottleneck_block_pallas(x, kp, precision=precision)


def _projection_fwd(x, params, precision):
    return _projection_fused_forward(x, params, precision), (x, params)


def _projection_bwd(precision, res, g):
    # Same per-layer-composition backward as _block_bwd (winograd-algebra
    # mid remat + data gradient), plus the projection shortcut's GEMM.
    def math(x_, p_):
        h = conv1x1_bn_train(
            x_, p_["w_reduce"], p_["s_reduce"], p_["b_reduce"], True
        )
        h = conv3x3_bn_winograd_train(
            h, p_["w_mid"], p_["s_mid"], p_["b_mid"], True, 2
        )
        h = conv1x1_bn_train(
            h, p_["w_expand"], p_["s_expand"], p_["b_expand"], False
        )
        skip = conv1x1_bn_train(
            x_, p_["w_proj"], p_["s_proj"], p_["b_proj"], False
        )
        return jnp.maximum(h + skip, 0.0)

    x, params = res
    _, vjp_fn = jax.vjp(math, x, params)
    return vjp_fn(g)


projection_block_train_fused.defvjp(_projection_fwd, _projection_bwd)


# --- weight-streaming stage (the megakernel's VMEM-gated geometries) -----------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def resnet_stage_train_streamed(x, blocks, precision: str | None = None):
    """Differentiable stack of IDENTITY bottleneck blocks whose FORWARD is
    the weight-STREAMING stage megakernel (kernels/stage.py) — the same
    kernel serving uses at these geometries. Covers the blocks the
    whole-block megakernel cannot train (conv2_x's 56x56 maps and
    conv5_x's 2048-wide io overrun its scoped-VMEM budget inside a train
    step — models/downsample.py::resnet50_stages_train): the stage kernel
    streams each block's weights instead of staging them whole, so its
    footprint is bounded, and the activation stays in VMEM between blocks
    where the per-layer fallback pays ~5 HBM activation round trips per
    block. blocks carry the RAW w_mid (Cmid, Cmid/4-style, 3, 3); both
    offline filter layouts are fixed linear maps derived in-trace, so the
    stage kernel's mid-algo auto-select (winograd2 on large maps, direct
    im2col otherwise) applies to the training forward exactly as in
    serving. BACKWARD differentiates the per-layer train composition per
    block (the same math as _block_bwd, chained)."""
    return _stage_streamed_forward(x, blocks, precision)


def _stage_streamed_forward(x, blocks, precision=None):
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.kernels.stage import (
        resnet_stage_fused_pallas,
        stack_stage_params,
    )

    large_map = x.shape[-3] * x.shape[-2] >= 28 * 28
    kps = []
    for b in blocks:
        kp = dict(b)
        kp["w9_mid"] = direct_filter(b["w_mid"])
        if large_map:
            # Only stacked when the kernel will route the mid through the
            # F(2,3) algebra (h*w >= 784) — at small maps the direct
            # layout is used and the transform would be dead weight.
            kp["u2_mid"] = filter_transform_jnp(b["w_mid"], m=2)
        kps.append(kp)
    return resnet_stage_fused_pallas(
        x, stack_stage_params(kps), **_prec_kw(precision)
    )


def _stage_streamed_fwd(x, blocks, precision):
    return _stage_streamed_forward(x, blocks, precision), (x, blocks)


def _stage_streamed_bwd(precision, res, g):
    # Chain the per-block per-layer train composition (winograd-algebra mid
    # remat + data gradient, algebraic z recovery) — identical math to
    # _block_bwd applied block by block. The mid recompute mirrors the
    # forward kernel's geometry routing (winograd2 on large maps, direct
    # im2col below 28x28 — the round-4 7x7 finding: winograd streams 16/9x
    # the filter bytes there) so the backward pays the same algebra the
    # served forward ran and the recompute value agrees exactly.
    large_map = res[0].shape[-3] * res[0].shape[-2] >= 28 * 28

    def math(x_, bs_):
        for p_ in bs_:
            h = conv1x1_bn_train(
                x_, p_["w_reduce"], p_["s_reduce"], p_["b_reduce"], True
            )
            if large_map:
                h = conv3x3_bn_winograd_train(
                    h, p_["w_mid"], p_["s_mid"], p_["b_mid"], True, 2
                )
            else:
                h = conv3x3_bn_direct_train(
                    h, p_["w_mid"], p_["s_mid"], p_["b_mid"], True
                )
            h = conv1x1_bn_train(
                h, p_["w_expand"], p_["s_expand"], p_["b_expand"], False
            )
            x_ = jnp.maximum(h + x_, 0.0)
        return x_

    x, blocks = res
    _, vjp_fn = jax.vjp(math, x, blocks)
    return vjp_fn(g)


resnet_stage_train_streamed.defvjp(_stage_streamed_fwd, _stage_streamed_bwd)


# --- basic-family streamed stage (ResNet-18/34 small-map identity runs) --------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def basic_stage_train_streamed(x, blocks, precision: str | None = None):
    """Differentiable run of IDENTITY basic blocks whose FORWARD is the
    fused weight-streaming basic-stage kernel (kernels/basic_stage.py) —
    the same kernel serving routes on small maps (7x7x512), so the trained
    forward matches the served forward there instead of paying per-conv
    per-layer kernels. blocks carry the RAW w_a/w_b (OIHW); the direct
    im2col layout is a fixed permutation derived in-trace so gradients
    flow to the raw filters. BACKWARD differentiates the per-layer train
    composition (the direct-conv wrappers, matching
    models/basic.py::basicnet_forward_train's small-map route)."""
    return _basic_streamed_forward(x, blocks, precision)


def _basic_streamed_forward(x, blocks, precision=None):
    from winograd_tpu.kernels.basic_stage import (
        basic_stage_fused_pallas,
        stack_basic_stage_params,
    )
    from winograd_tpu.kernels.direct import direct_filter

    kps = [
        {
            "w9_a": direct_filter(b["w_a"]),
            "s_a": b["s_a"], "b_a": b["b_a"],
            "w9_b": direct_filter(b["w_b"]),
            "s_b": b["s_b"], "b_b": b["b_b"],
        }
        for b in blocks
    ]
    return basic_stage_fused_pallas(
        x, stack_basic_stage_params(kps), **_prec_kw(precision)
    )


def _basic_streamed_fwd(x, blocks, precision):
    return _basic_streamed_forward(x, blocks, precision), (x, blocks)


def _basic_streamed_bwd(precision, res, g):
    def math(x_, bs_):
        for p_ in bs_:
            h = conv3x3_bn_direct_train(x_, p_["w_a"], p_["s_a"], p_["b_a"], True)
            h = conv3x3_bn_direct_train(h, p_["w_b"], p_["s_b"], p_["b_b"], False)
            x_ = jnp.maximum(h + x_, 0.0)
        return x_

    x, blocks = res
    _, vjp_fn = jax.vjp(math, x, blocks)
    return vjp_fn(g)


basic_stage_train_streamed.defvjp(_basic_streamed_fwd, _basic_streamed_bwd)

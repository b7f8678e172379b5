"""Pure-jnp fused operators: differentiable, jit-able, device-agnostic.

These are the framework's *functional* definition of each op — used as the
training-capable path (they have gradients for free), as a second oracle for
the Pallas kernels, and as the building blocks of the multi-chip sharded
model (XLA inserts the collectives when inputs are sharded over a Mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bn_act(y: jax.Array, scale: jax.Array, bias: jax.Array, relu: bool) -> jax.Array:
    out = y * scale + bias
    return jnp.maximum(out, 0.0) if relu else out


def conv3x3_bn_relu(x, w, scale, bias, relu: bool = True, precision=None) -> jax.Array:
    """Fused 3x3 conv (pad 1, cross-correlation) + folded BN + ReLU.

    x: (N, H, W, Cin) or (H, W, Cin); w: (Cout, Cin, 3, 3) (reference's
    NCHW-filter convention, data_generator.py:55-61). precision defaults to
    HIGHEST (the vendor-baseline role); the train-step backwards pass HIGH
    (kernels/vjp.py::BWD_PRECISION).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    # OIHW -> HWIO for lax conv with NHWC activations.
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))
    y = jax.lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.HIGHEST,
    )
    y = bn_act(y, scale, bias, relu)
    return y[0] if squeeze else y


def conv1x1_bn(x, w, scale, bias, relu: bool, precision=None) -> jax.Array:
    """Fused pointwise conv + folded BN (+ ReLU). x: (..., Cin); w: (Cin, Cout)."""
    y = jnp.dot(
        x,
        w,
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.HIGHEST,
    )
    return bn_act(y, scale, bias, relu)


def conv3x3_s2_bn_relu(x, w, scale, bias, relu: bool = True, precision=None) -> jax.Array:
    """Stride-2 SAME 3x3 conv + BN (+ReLU), differentiable XLA path."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 3, 1, 0)),
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.HIGHEST,
    )
    y = bn_act(y, scale, bias, relu)
    return y[0] if squeeze else y


def downsample_bottleneck_block(x, params, stride: int = 2, precision=None) -> jax.Array:
    """ResNet v1.5 transition block (differentiable XLA path; keys as in
    models/downsample.py with raw w_mid). stride=1 is the PROJECTION block
    (conv2_x's entry: channels change, resolution doesn't)."""
    p = precision
    h = conv1x1_bn(
        x, params["w_reduce"], params["s_reduce"], params["b_reduce"],
        relu=True, precision=p,
    )
    if stride == 2:
        h = conv3x3_s2_bn_relu(
            h, params["w_mid"], params["s_mid"], params["b_mid"],
            relu=True, precision=p,
        )
        x_skip = x[..., ::2, ::2, :]
    else:
        h = conv3x3_bn_relu(
            h, params["w_mid"], params["s_mid"], params["b_mid"],
            relu=True, precision=p,
        )
        x_skip = x
    h = conv1x1_bn(
        h, params["w_expand"], params["s_expand"], params["b_expand"],
        relu=False, precision=p,
    )
    skip = conv1x1_bn(
        x_skip, params["w_proj"], params["s_proj"], params["b_proj"],
        relu=False, precision=p,
    )
    return jnp.maximum(h + skip, 0.0)


def conv7x7_s2_bn_relu(x, w7, scale, bias, precision=None) -> jax.Array:
    """ResNet stem conv: 7x7, stride 2, pad 3 + folded BN + ReLU.
    w7: (Cout, Cin, 7, 7) OIHW.

    `precision` maps the serving tiers onto XLA's conv-emitter algorithms
    (measured v5e, 224x224x3 stem + maxpool, vs the float64 golden):
      None   -> HIGHEST: exact-class (err 0), ~352 us — the strict-1e-4 tier
      bf16w  -> HIGH:    2.07e-4,             ~190 us
      int8   -> DEFAULT: 3.1e-3,              ~88 us
    MEASURED DEAD END (round 3): applying the split_dot bf16-hi/lo trick to
    the conv emitter (3 DEFAULT-precision convs over operand splits, with
    optimization_barrier to stop re-merging) does NOT reconstruct f32:
    terms=3 still errs 2.48e-3 at 273 us — barely below plain DEFAULT's
    3.14e-3 — because DEFAULT's conv error is algorithmic (its internal
    space-to-depth/layout passes), not operand rounding. HIGH beats it on
    both axes; don't revisit without a different decomposition."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    xla_prec = {
        None: jax.lax.Precision.HIGHEST,
        "bf16w": jax.lax.Precision.HIGH,
        "int8": jax.lax.Precision.DEFAULT,
    }[precision]
    # ceil(h/2) output like the golden model (reference.stem): bottom/right
    # pad grows by 1 on odd extents so the last stride-2 sample exists.
    h, w = x.shape[1], x.shape[2]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w7, (2, 3, 1, 0)),
        window_strides=(2, 2),
        padding=((3, 2 + h % 2), (3, 2 + w % 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=xla_prec,
    )
    y = bn_act(y, scale, bias, relu=True)
    return y[0] if squeeze else y


def maxpool3x3_s2(x) -> jax.Array:
    """3x3/2 max pool, pad 1 top/left (-inf semantics, ceil(h/2) output —
    both matching the golden model)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h, w = x.shape[1], x.shape[2]
    y = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, h % 2), (1, w % 2), (0, 0)),
    )
    return y[0] if squeeze else y


def stem(x, params) -> jax.Array:
    """ResNet-50 stem (XLA path): conv7x7/2 + BN + ReLU + maxpool3x3/2.
    Keys: w7_stem (Cout, 3, 7, 7), s_stem, b_stem."""
    h = conv7x7_s2_bn_relu(x, params["w7_stem"], params["s_stem"], params["b_stem"])
    return maxpool3x3_s2(h)


def head(x, params) -> jax.Array:
    """ResNet-50 head (XLA path): global avgpool + FC logits.
    Keys: w_fc (C, num_classes), b_fc (num_classes,)."""
    pooled = jnp.mean(x, axis=(-3, -2))
    return (
        jnp.dot(
            pooled, params["w_fc"],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + params["b_fc"]
    )


def bottleneck_block(x, params, precision=None) -> jax.Array:
    """ResNet bottleneck with identity skip; params is a dict pytree.

    Keys: w_reduce (Cio, Cmid), s_reduce, b_reduce, w_mid (Cmid, Cmid, 3, 3)
    [OIHW], s_mid, b_mid, w_expand (Cmid, Cio), s_expand, b_expand.
    """
    p = precision
    h = conv1x1_bn(
        x, params["w_reduce"], params["s_reduce"], params["b_reduce"],
        relu=True, precision=p,
    )
    h = conv3x3_bn_relu(
        h, params["w_mid"], params["s_mid"], params["b_mid"], relu=True, precision=p
    )
    h = conv1x1_bn(
        h, params["w_expand"], params["s_expand"], params["b_expand"],
        relu=False, precision=p,
    )
    return jnp.maximum(h + x, 0.0)


def basic_block(x, params, precision=None) -> jax.Array:
    """ResNet BASIC block with identity skip (XLA path) — the ResNet-18/34
    family. Keys: w_a/w_b (C, C, 3, 3) OIHW, s_a/b_a, s_b/b_b."""
    p = precision
    h = conv3x3_bn_relu(x, params["w_a"], params["s_a"], params["b_a"],
                        relu=True, precision=p)
    h = conv3x3_bn_relu(h, params["w_b"], params["s_b"], params["b_b"],
                        relu=False, precision=p)
    return jnp.maximum(h + x, 0.0)


def downsample_basic_block(x, params, precision=None) -> jax.Array:
    """ResNet BASIC downsampling block (XLA path): stride-2 3x3 + BN +
    ReLU -> 3x3 + BN; stride-2 1x1 projection shortcut + BN; add -> ReLU.
    Extra keys vs basic_block: w_proj (Cin, Cout), s_proj, b_proj; w_a is
    (Cout, Cin, 3, 3)."""
    p = precision
    h = conv3x3_s2_bn_relu(x, params["w_a"], params["s_a"], params["b_a"],
                           relu=True, precision=p)
    h = conv3x3_bn_relu(h, params["w_b"], params["s_b"], params["b_b"],
                        relu=False, precision=p)
    skip = conv1x1_bn(
        x[..., ::2, ::2, :], params["w_proj"], params["s_proj"],
        params["b_proj"], relu=False, precision=p,
    )
    return jnp.maximum(h + skip, 0.0)

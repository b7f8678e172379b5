"""Int8 quantized fused conv kernels — the low-precision serving tier.

The reference is f32-only. On TPU the MXU runs int8 x int8 -> int32 at
twice the bf16 rate, so a quantized tier is the natural serving option for
throughput-bound deployments. Scheme (standard, simple, symmetric):

* Weights: OFFLINE symmetric per-output-channel quantization
  (quantize_weights): w_q = round(w / s_w[col]), s_w = max|w[:, col]| / 127.
* Activations: dynamic symmetric per-tensor quantization IN-KERNEL:
  s_x = max|x| / 127 computed on the VPU, stochastic-free round-to-nearest.
* GEMM: int8 x int8 -> int32 on the MXU, dequantized by s_x * s_w[col],
  then the usual folded-BN FMA (+ReLU) epilogue in f32.

Accuracy tier: ~1e-2 relative (8-bit), NOT the f32 1e-4 parity bar — the
tests check a quantization-appropriate bound instead. Use for serving where
throughput matters more than the last two digits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weights(w) -> tuple:
    """Symmetric per-output-channel int8 weights. w: (Cin, Cout) ->
    (w_q int8 (Cin, Cout), s_w f32 (Cout,))."""
    w = np.asarray(w, np.float32)
    s_w = np.abs(w).max(axis=0) / 127.0
    s_w = np.where(s_w == 0, 1.0, s_w).astype(np.float32)
    w_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
    return w_q, s_w


def _quant_matmul_kernel(
    x_ref,      # (P, Cin) f32
    wq_ref,     # (Cin, Cout) int8
    sw_ref,     # (1, Cout) f32
    scale_ref,  # (1, Cout) f32 folded-BN scale
    bias_ref,   # (1, Cout) f32 folded-BN bias
    out_ref,    # (P, Cout) f32
    *,
    relu: bool,
):
    x = x_ref[:]
    # Dynamic symmetric per-tensor activation quantization on the VPU.
    s_x = jnp.max(jnp.abs(x)) / 127.0
    s_x = jnp.where(s_x == 0, 1.0, s_x)
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * sw_ref[:])
    y = y * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv1x1_bn_int8_pallas(
    x: jax.Array,
    w_q: jax.Array,
    s_w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Quantized fused pointwise conv. x: (..., Cin) f32; w_q: (Cin, Cout)
    int8; s_w: (Cout,) weight scales; scale/bias: folded BN."""
    cin, cout = w_q.shape
    lead = x.shape[:-1]
    p = int(np.prod(lead)) if lead else 1
    x2d = x.reshape(p, cin).astype(jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p_pad = -(-p // 8) * 8
    if p_pad != p:
        x2d = jnp.pad(x2d, ((0, p_pad - p), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_quant_matmul_kernel, relu=relu),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * cin * cout,
            bytes_accessed=4 * p_pad * cin + cin * cout + 4 * p_pad * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x2d,
        jnp.asarray(w_q, jnp.int8),
        jnp.asarray(s_w, jnp.float32).reshape(1, cout),
        jnp.asarray(scale, jnp.float32).reshape(1, cout),
        jnp.asarray(bias, jnp.float32).reshape(1, cout),
    )
    return out[:p].reshape(*lead, cout)

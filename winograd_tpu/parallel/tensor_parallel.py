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
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas


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

"""The ResNet bottleneck block as ONE fused Pallas kernel (the megakernel).

The reference fuses conv+BN+ReLU per layer (three fused layers plus a skip
it never composes). This kernel fuses the ENTIRE bottleneck block:

    1x1 reduce + BN + ReLU  ->  3x3 (im2col GEMM) + BN + ReLU
    ->  1x1 expand + BN  ->  skip add  ->  ReLU

in a single Pallas program — activations never leave VMEM between layers
and the block costs one kernel launch instead of three. Per image block:
one HBM read of x, one HBM write of y, weights resident across grid steps.

Weight artifacts are the same offline forms the layer kernels use:
w_reduce (Cio, Cmid), w9_mid (9*Cmid, Cmid) [kernels/direct.py layout],
w_expand (Cmid, Cio), plus the three folded-BN (scale, bias) pairs.
VMEM at the reference's dimensions (Cio=1024, Cmid=256, 14x14): ~4.4 MB of
weights + ~3.5 MB of activations/scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels.direct import split_dot


def _block_kernel(
    x_ref,     # (1, H, W, Cio)
    wr_ref,    # (Cio, Cmid)
    s1_ref, b1_ref,   # (1, Cmid)
    w9_ref,    # (9*Cmid, Cmid)
    s2_ref, b2_ref,   # (1, Cmid)
    we_ref,    # (Cmid, Cio)
    s3_ref, b3_ref,   # (1, Cio)
    out_ref,   # (1, H, W, Cio)
    xpad_ref,  # scratch (H+2, W+2, Cmid)
    col_ref,   # scratch (H*W, 9*Cmid)
    *,
    h: int,
    w: int,
    cio: int,
    cmid: int,
    precision: str,
):
    hw = h * w
    x2 = x_ref[0].reshape(hw, cio)

    # --- 1x1 reduce + BN + ReLU (MXU GEMM, epilogue on VPU) ---
    h1 = split_dot(x2, wr_ref[:], precision) * s1_ref[:] + b1_ref[:]
    h1 = jnp.maximum(h1, 0.0)

    # --- 3x3 + BN + ReLU via in-VMEM im2col GEMM (kernels/direct.py) ---
    xpad_ref[0:1, :, :] = jnp.zeros((1, w + 2, cmid), jnp.float32)
    xpad_ref[h + 1 :, :, :] = jnp.zeros((1, w + 2, cmid), jnp.float32)
    xpad_ref[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cmid), jnp.float32)
    xpad_ref[1 : h + 1, w + 1 :, :] = jnp.zeros((h, 1, cmid), jnp.float32)
    xpad_ref[1 : h + 1, 1 : w + 1, :] = h1.reshape(h, w, cmid)
    for r in range(3):
        for s in range(3):
            patch = xpad_ref[r : r + h, s : s + w, :].reshape(hw, cmid)
            k = (3 * r + s) * cmid
            col_ref[:, k : k + cmid] = patch
    h2 = split_dot(col_ref[:], w9_ref[:], precision) * s2_ref[:] + b2_ref[:]
    h2 = jnp.maximum(h2, 0.0)

    # --- 1x1 expand + BN (no ReLU), skip add, final ReLU ---
    h3 = split_dot(h2, we_ref[:], precision) * s3_ref[:] + b3_ref[:]
    y = jnp.maximum(h3 + x2, 0.0)
    out_ref[0] = y.reshape(h, w, cio)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def bottleneck_block_fused_pallas(
    x: jax.Array,
    params: dict,
    *,
    interpret: bool | None = None,
    precision: str = "bf16x3",
) -> jax.Array:
    """One-kernel bottleneck block. x: (H, W, Cio) or (N, H, W, Cio);
    params needs w_reduce/s_reduce/b_reduce, w9_mid/s_mid/b_mid,
    w_expand/s_expand/b_expand (see models/resnet.py)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cio = x.shape
    cmid = params["w_reduce"].shape[1]
    assert params["w9_mid"].shape == (9 * cmid, cmid), params["w9_mid"].shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    kernel = functools.partial(
        _block_kernel, h=h, w=w, cio=cio, cmid=cmid, precision=precision
    )
    const = lambda i: (0, 0)
    flops = 2 * n * h * w * (cio * cmid + 9 * cmid * cmid + cmid * cio)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, cio), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cio, cmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cmid, cmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cio), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cio), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cio), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cio), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cio), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((h * w, 9 * cmid), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4
            * (2 * n * h * w * cio + cio * cmid * 2 + 9 * cmid * cmid),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        jnp.asarray(params["w_reduce"], jnp.float32),
        row(params["s_reduce"], cmid),
        row(params["b_reduce"], cmid),
        jnp.asarray(params["w9_mid"], jnp.float32),
        row(params["s_mid"], cmid),
        row(params["b_mid"], cmid),
        jnp.asarray(params["w_expand"], jnp.float32),
        row(params["s_expand"], cio),
        row(params["b_expand"], cio),
    )
    return out[0] if squeeze else out

"""A whole ResNet stage as ONE Pallas kernel with weight streaming.

One step beyond the block megakernel (kernels/block.py): ALL blocks of a
stage run inside a single pallas_call. The grid iterates (image, block);
the activation lives in a VMEM scratch buffer that persists across grid
steps, so between blocks it never touches HBM at all — and each block's
weights are a grid-indexed input block, which Pallas's pipeline machinery
automatically DMAs for block b+1 while block b computes (the double-buffer
pattern from the Pallas guide, obtained for free from the BlockSpec
index_map). Per image: one HBM read of x, one HBM write of y, and a
streamed pass over the stage's weights.

Parameters arrive stacked per block: w_reduce (B, Cio, Cmid),
w9_mid (B, 9*Cmid, Cmid), w_expand (B, Cmid, Cio), BN rows (B, 1, C).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels.direct import split_dot

_BLOCK_KEYS = (
    "w_reduce", "s_reduce", "b_reduce", "w9_mid", "s_mid", "b_mid",
    "w_expand", "s_expand", "b_expand",
)


def stack_stage_params(params_list: List[dict]) -> dict:
    """Stack per-block params on a leading block axis (BN as (B, 1, C))."""
    out = {}
    for key in _BLOCK_KEYS:
        arrs = [jnp.asarray(p[key], jnp.float32) for p in params_list]
        if arrs[0].ndim == 1:
            arrs = [a.reshape(1, -1) for a in arrs]
        out[key] = jnp.stack(arrs)
    return out


def _stage_kernel(
    x_ref,     # (1, H, W, Cio)
    wr_ref,    # (1, Cio, Cmid)     block b's weights
    s1_ref, b1_ref,   # (1, 1, Cmid)
    w9_ref,    # (1, 9*Cmid, Cmid)
    s2_ref, b2_ref,   # (1, 1, Cmid)
    we_ref,    # (1, Cmid, Cio)
    s3_ref, b3_ref,   # (1, 1, Cio)
    out_ref,   # (1, H, W, Cio)
    act_ref,   # scratch (H*W, Cio)  persists across grid steps
    xpad_ref,  # scratch (H+2, W+2, Cmid)
    col_ref,   # scratch (H*W, 9*Cmid)
    *,
    h: int,
    w: int,
    cio: int,
    cmid: int,
    n_blocks: int,
    precision: str,
):
    hw = h * w
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _load_input():
        act_ref[:] = x_ref[0].reshape(hw, cio)

    x2 = act_ref[:]
    h1 = jnp.maximum(split_dot(x2, wr_ref[0], precision) * s1_ref[0] + b1_ref[0], 0.0)

    xpad_ref[0:1, :, :] = jnp.zeros((1, w + 2, cmid), jnp.float32)
    xpad_ref[h + 1 :, :, :] = jnp.zeros((1, w + 2, cmid), jnp.float32)
    xpad_ref[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cmid), jnp.float32)
    xpad_ref[1 : h + 1, w + 1 :, :] = jnp.zeros((h, 1, cmid), jnp.float32)
    xpad_ref[1 : h + 1, 1 : w + 1, :] = h1.reshape(h, w, cmid)
    for r in range(3):
        for s in range(3):
            patch = xpad_ref[r : r + h, s : s + w, :].reshape(hw, cmid)
            col_ref[:, (3 * r + s) * cmid : (3 * r + s + 1) * cmid] = patch
    h2 = jnp.maximum(split_dot(col_ref[:], w9_ref[0], precision) * s2_ref[0] + b2_ref[0], 0.0)

    h3 = split_dot(h2, we_ref[0], precision) * s3_ref[0] + b3_ref[0]
    y = jnp.maximum(h3 + x2, 0.0)
    act_ref[:] = y

    @pl.when(b == n_blocks - 1)
    def _store_output():
        out_ref[0] = y.reshape(h, w, cio)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def resnet_stage_fused_pallas(
    x: jax.Array,
    stacked: dict,
    *,
    interpret: bool | None = None,
    precision: str = "bf16x3",
) -> jax.Array:
    """Run a whole stage of identity bottleneck blocks in ONE kernel.

    x: (H, W, Cio) or (N, H, W, Cio); stacked from stack_stage_params."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cio = x.shape
    n_blocks, _, cmid = stacked["w_reduce"].shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _stage_kernel,
        h=h, w=w, cio=cio, cmid=cmid, n_blocks=n_blocks, precision=precision,
    )
    img = lambda i, b: (i, 0, 0, 0)
    blk = lambda shape: pl.BlockSpec((1,) + shape, lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM)
    flops = 2 * n * n_blocks * h * w * (cio * cmid + 9 * cmid * cmid + cmid * cio)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, h, w, cio), img, memory_space=pltpu.VMEM),
            blk((cio, cmid)), blk((1, cmid)), blk((1, cmid)),
            blk((9 * cmid, cmid)), blk((1, cmid)), blk((1, cmid)),
            blk((cmid, cio)), blk((1, cio)), blk((1, cio)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cio), img, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cio), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h * w, cio), jnp.float32),
            pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((h * w, 9 * cmid), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4
            * (2 * n * h * w * cio + n_blocks * (2 * cio * cmid + 9 * cmid * cmid)),
            transcendentals=0,
        ),
        # Double-buffered weight streaming + persistent activation scratch
        # needs ~17 MB; raise the compiler's conservative 16 MB scoped cap
        # (v5e has far more physical VMEM).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        stacked["w_reduce"], stacked["s_reduce"], stacked["b_reduce"],
        stacked["w9_mid"], stacked["s_mid"], stacked["b_mid"],
        stacked["w_expand"], stacked["s_expand"], stacked["b_expand"],
    )
    return out[0] if squeeze else out

"""A run of IDENTITY basic blocks (ResNet-18/34) as ONE Pallas kernel.

The basic family's small-map stages are weight-stream bound: a 7x7x512
identity block streams two 9.4 MB direct filter matrices over a 49-row
map, and the per-layer composition (models/basic.py::basic_block_pallas)
pays, per conv, an HBM read+write of the activation plus a kernel launch
— measured 16.2 us/conv f32 against an 11.6 us HBM weight floor. This
kernel runs a whole run of identity blocks in one pallas_call with the
stage-megakernel recipe (kernels/stage.py): grid (image, block), the
activation persists in a VMEM scratch across blocks (no HBM round trips
between convs or blocks), and each block's two filter matrices are
grid-indexed input blocks that Pallas's pipeline DMAs for block b+1
while block b computes.

Reference frame: the reference has no basic-family or multi-layer fusion
at all (it benchmarks single 14x14 bottleneck layers,
/root/reference/Test.c:13-56); this is the TPU-native extension of its
fused-layer idea to the ResNet-18/34 stages.

Both convs run as SAME-pad 3x3 im2col GEMMs (the measured-fastest route
at 7x7 — the F(2,3) artifact streams 16/9x the direct layout's bytes
over a map too small to amortize; models/basic.py::_conv3x3). Tiers: f32
(precision="bf16x3" split GEMMs, strict 1e-4 parity) and bf16w (weights
streamed as bfloat16 — half the HBM bytes on a weight-bound shape).

Parameters arrive stacked per block: w9_a/w9_b (B, 9C, C) direct layouts,
BN rows s_a/b_a/s_b/b_b (B, 1, C) — stack_basic_stage_params.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels.direct import split_dot
from winograd_tpu.kernels.stage import _im2col_same3x3

_KEYS = ("w9_a", "s_a", "b_a", "w9_b", "s_b", "b_b")


def stack_basic_stage_params(params_list: List[dict]) -> dict:
    """Stack per-block identity basic-block params on a leading block axis
    (BN rows as (B, 1, C))."""
    out = {}
    for key in _KEYS:
        arrs = [jnp.asarray(p[key], jnp.float32) for p in params_list]
        if arrs[0].ndim == 1:
            arrs = [a.reshape(1, -1) for a in arrs]
        out[key] = jnp.stack(arrs)
    return out


def _basic_stage_kernel(
    x_ref,     # (1, H, W, C)
    wa_ref, sa_ref, ba_ref,   # (1, 9C, C), (1, 1, C), (1, 1, C)
    wb_ref, sb_ref, bb_ref,
    out_ref,   # (1, H, W, C)
    act_ref,   # scratch (H*W, C) — persists across the block grid axis
    xpad_ref,  # scratch (H+2, W+2, C)
    col_ref,   # scratch (H*W, 9C) — shared by both convs
    *,
    h: int,
    w: int,
    c: int,
    n_blocks: int,
    precision: str,
):
    hw = h * w
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _load_input():
        act_ref[:] = x_ref[0].reshape(hw, c)

    def conv(rows, w9_ref, s_ref, b_ref, relu):
        def col_write(t, patch):
            col_ref[:, t * c : (t + 1) * c] = patch

        _im2col_same3x3(
            xpad_ref, rows.reshape(h, w, c), col_write, h=h, w=w, cmid=c
        )
        y = split_dot(col_ref[:], w9_ref[0], precision) * s_ref[0] + b_ref[0]
        return jnp.maximum(y, 0.0) if relu else y

    x2 = act_ref[:]
    h1 = conv(x2, wa_ref, sa_ref, ba_ref, True)
    h2 = conv(h1, wb_ref, sb_ref, bb_ref, False)
    y = jnp.maximum(h2 + x2, 0.0)
    act_ref[:] = y

    @pl.when(b == n_blocks - 1)
    def _store_output():
        out_ref[0] = y.reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def basic_stage_fused_pallas(
    x: jax.Array,
    stacked: dict,
    *,
    interpret: bool | None = None,
    precision: str = "bf16x3",
) -> jax.Array:
    """Run a run of identity BASIC blocks in ONE kernel.

    x: (H, W, C) or (N, H, W, C); stacked from stack_basic_stage_params.
    precision="bf16w" streams bfloat16 weight matrices (half the f32 HBM
    bytes — the lever on these weight-bound shapes); activations and BN
    rows stay f32 (kernels/direct.py::split_dot)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w_, c = x.shape
    n_blocks = stacked["w9_a"].shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wdt = jnp.bfloat16 if precision == "bf16w" else jnp.float32
    wbytes_per = 2 if precision == "bf16w" else 4

    kernel = functools.partial(
        _basic_stage_kernel,
        h=h, w=w_, c=c, n_blocks=n_blocks, precision=precision,
    )
    blk = lambda shape: pl.BlockSpec(
        (1,) + shape,
        (lambda i, b: (b,) + (0,) * len(shape)),
        memory_space=pltpu.VMEM,
    )
    img = lambda i, b: (i, 0, 0, 0)
    hw = h * w_
    flops = 2 * n * n_blocks * hw * 2 * 9 * c * c
    weight_bytes = wbytes_per * n_blocks * 2 * 9 * c * c
    act_elems = 5 * hw * c + (h + 2) * (w_ + 2) * c + hw * 9 * c
    # Same 1.5x scoped-stack margin as the bottleneck stage kernel
    # (kernels/stage.py): the compiler adds copy/layout temporaries beyond
    # the declared buffers.
    vmem_limit = max(
        24 * 1024 * 1024,
        int(1.5 * (2 * wbytes_per * 2 * 9 * c * c + 4 * act_elems)),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, h, w_, c), img, memory_space=pltpu.VMEM),
            blk((9 * c, c)), blk((1, c)), blk((1, c)),
            blk((9 * c, c)), blk((1, c)), blk((1, c)),
        ],
        out_specs=pl.BlockSpec((1, h, w_, c), img, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hw, c), jnp.float32),
            pltpu.VMEM((h + 2, w_ + 2, c), jnp.float32),
            pltpu.VMEM((hw, 9 * c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * 2 * n * hw * c + n * weight_bytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        stacked["w9_a"].astype(wdt), stacked["s_a"], stacked["b_a"],
        stacked["w9_b"].astype(wdt), stacked["s_b"], stacked["b_b"],
    )
    return out[0] if squeeze else out


# --- int8 tier ------------------------------------------------------------------


def quantize_basic_stage_params(params_list: List[dict]) -> dict:
    """Offline int8 quantization of a run of identity basic blocks for the
    fused stage kernel: per-output-channel symmetric weight scales
    (kernels/quantized.py::quantize_weights), stacked per block; BN rows
    stay f32."""
    from winograd_tpu.kernels.quantized import quantize_weights

    out = {}
    for leg in ("a", "b"):
        qs, ss = [], []
        for p in params_list:
            wq, sw = quantize_weights(np.asarray(p[f"w9_{leg}"]))
            qs.append(wq)
            ss.append(sw.reshape(1, -1))
        out[f"w9_{leg}_q"] = jnp.asarray(np.stack(qs))
        out[f"w9_{leg}_s"] = jnp.asarray(np.stack(ss))
        for k in (f"s_{leg}", f"b_{leg}"):
            rows = [np.asarray(p[k], np.float32).reshape(1, -1) for p in params_list]
            out[k] = jnp.asarray(np.stack(rows))
    return out


def _basic_stage_int8_kernel(
    x_ref,
    wqa_ref, swa_ref, sa_ref, ba_ref,   # (1, 9C, C) int8, (1, 1, C) f32 x3
    wqb_ref, swb_ref, sb_ref, bb_ref,
    out_ref,
    act_ref,
    xpad_ref,
    col_ref,
    *,
    h: int,
    w: int,
    c: int,
    n_blocks: int,
):
    from winograd_tpu.kernels.quantized import _qdot

    hw = h * w
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _load_input():
        act_ref[:] = x_ref[0].reshape(hw, c)

    def conv(rows, wq_ref, sw_ref, s_ref, b_ref, relu):
        def col_write(t, patch):
            col_ref[:, t * c : (t + 1) * c] = patch

        _im2col_same3x3(
            xpad_ref, rows.reshape(h, w, c), col_write, h=h, w=w, cmid=c
        )
        # Dynamic per-row activation scales + int8 MXU GEMM + dequant.
        y = _qdot(col_ref[:], wq_ref[0], sw_ref[0]) * s_ref[0] + b_ref[0]
        return jnp.maximum(y, 0.0) if relu else y

    x2 = act_ref[:]
    h1 = conv(x2, wqa_ref, swa_ref, sa_ref, ba_ref, True)
    h2 = conv(h1, wqb_ref, swb_ref, sb_ref, bb_ref, False)
    y = jnp.maximum(h2 + x2, 0.0)
    act_ref[:] = y

    @pl.when(b == n_blocks - 1)
    def _store_output():
        out_ref[0] = y.reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def basic_stage_int8_pallas(
    x: jax.Array,
    qstacked: dict,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """int8 twin of basic_stage_fused_pallas: the streamed filter matrices
    are int8 (quarter the f32 HBM bytes on a weight-bound shape) with
    per-output-channel weight scales and per-row dynamic activation
    scales; activations and BN rows stay f32."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w_, c = x.shape
    n_blocks = qstacked["w9_a_q"].shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _basic_stage_int8_kernel, h=h, w=w_, c=c, n_blocks=n_blocks
    )
    blk = lambda shape, space=pltpu.VMEM: pl.BlockSpec(
        (1,) + shape,
        (lambda i, b: (b,) + (0,) * len(shape)),
        memory_space=space,
    )
    img = lambda i, b: (i, 0, 0, 0)
    hw = h * w_
    flops = 2 * n * n_blocks * hw * 2 * 9 * c * c
    weight_bytes = n_blocks * 2 * 9 * c * c
    act_elems = 5 * hw * c + (h + 2) * (w_ + 2) * c + hw * 9 * c
    vmem_limit = max(
        24 * 1024 * 1024,
        int(1.5 * (2 * 2 * 9 * c * c + 4 * act_elems)),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, h, w_, c), img, memory_space=pltpu.VMEM),
            blk((9 * c, c)), blk((1, c)), blk((1, c)), blk((1, c)),
            blk((9 * c, c)), blk((1, c)), blk((1, c)), blk((1, c)),
        ],
        out_specs=pl.BlockSpec((1, h, w_, c), img, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hw, c), jnp.float32),
            pltpu.VMEM((h + 2, w_ + 2, c), jnp.float32),
            pltpu.VMEM((hw, 9 * c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * 2 * n * hw * c + n * weight_bytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        qstacked["w9_a_q"], qstacked["w9_a_s"],
        qstacked["s_a"], qstacked["b_a"],
        qstacked["w9_b_q"], qstacked["w9_b_s"],
        qstacked["s_b"], qstacked["b_b"],
    )
    return out[0] if squeeze else out

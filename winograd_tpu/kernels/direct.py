"""Fused 3x3 conv + BN (+ReLU) as ONE im2col-GEMM Pallas kernel.

The second 3x3 algorithm next to Winograd (kernels/winograd.py) — the same
role cuDNN's IMPLICIT_GEMM (algo 0) plays next to WINOGRAD (algo 6) in the
reference's baseline setup (/root/reference/Kernel128_winograd.cu:367,
Kernel128_one.cu:176). At inference batch 1 on 14x14 maps the MXU often
prefers this shape: ONE (H*W, 9*Cin) x (9*Cin, Cout) GEMM at full systolic
utilization beats Winograd's 36 skinny per-position GEMMs despite doing
2.25x the FLOPs. The public conv3x3 op selects per-config (algo="auto").

In-kernel: zero-padded staging in VMEM, im2col built with 9 shifted
lane-aligned block writes, one K-tiled MXU GEMM, folded-BN FMA + ReLU on
the way out. One HBM read, one HBM write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def split_dot(a, b, precision: str):
    """MXU GEMM at a selectable accuracy/pass-count point.

    "highest": full-f32 multi-pass (6 bf16 passes on v5e) — the default.
    "bf16x3": manual hi/lo bf16 operand split, 3 single-pass dots
        (a_h b_h + a_h b_l + a_l b_h) with f32 accumulation — half the MXU
        passes of "highest"; measured max err ~4e-5 on the conv shapes here
        (pre-BN), comfortably under the 1e-4 parity bar which the bench
        harness enforces on every run.
    "bf16w": the bf16 WEIGHT-STORAGE tier — b must already be bfloat16
        (rounded offline, streamed from HBM at half the f32 bytes); the f32
        activation is split hi/lo so its contribution stays ~2^-17 and the
        output error is set by the offline weight rounding alone (~1e-3
        relative on unit-scale data — its own tier bound, between the f32
        parity bar and int8's ~1e-2). 2 single-pass MXU dots; for the
        HBM-bound streaming kernels the MXU is idle anyway.
    "default": single-pass bf16 (fails the parity bar; throughput probes).
    """
    if precision == "bf16w":
        assert b.dtype == jnp.bfloat16, b.dtype
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32)
        if a.ndim == 2 and a.shape[0] <= 128:
            # Same skinny-GEMM weight-load halving as bf16x3 below.
            r = a.shape[0]
            d1 = d(jnp.concatenate([ah, al], axis=0), b)
            return d1[:r] + d1[r:]
        return d(ah, b) + d(al, b)
    if precision == "bf16x3":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32)
        if a.ndim == 2 and a.shape[0] <= 128:
            # Skinny-GEMM regime (e.g. the Winograd per-position dots):
            # MXU weight loads dominate, so feed a_h and a_l through ONE
            # load of b_h by row-concatenation — 2 weight loads instead of
            # 3 for identical math (measured ~7% on the winograd kernel).
            r = a.shape[0]
            d1 = d(jnp.concatenate([ah, al], axis=0), bh)
            return d1[:r] + d1[r:] + d(ah, bl)
        return d(ah, bh) + d(ah, bl) + d(al, bh)
    if precision == "bf16":
        # Fully-bf16 single pass for BOTH operands — the int8-tier stem
        # route, where the activation matrix is produced in bf16 upstream
        # (half the relayout + stream bytes; error is bf16 rounding of both
        # operands, int8-tier class).
        return jnp.dot(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    prec = _HI if precision == "highest" else jax.lax.Precision.DEFAULT
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def direct_filter(w: np.ndarray | jax.Array) -> np.ndarray | jax.Array:
    """(Cout, Cin, 3, 3) OIHW -> (9*Cin, Cout) im2col GEMM layout.

    Row index = (3r + s) * Cin + c, matching the kernel's patch columns.
    """
    xp = jnp if isinstance(w, jax.Array) else np
    cout, cin = w.shape[0], w.shape[1]
    return xp.transpose(w, (2, 3, 1, 0)).reshape(9 * cin, cout)


def _direct_kernel(
    x_ref,      # (1, H, W, Cin)
    w9_ref,     # (9*Cin, TILE_CO)
    scale_ref,  # (1, TILE_CO)
    bias_ref,   # (1, TILE_CO)
    out_ref,    # (1, H, W, TILE_CO)
    xpad_ref,   # scratch (H+2, W+2, Cin)
    col_ref,    # scratch (H*W, 9*Cin)
    *,
    h: int,
    w: int,
    cin: int,
    relu: bool,
    precision: str,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _im2col():
        xpad_ref[0:1, :, :] = jnp.zeros((1, w + 2, cin), jnp.float32)
        xpad_ref[h + 1 :, :, :] = jnp.zeros((1, w + 2, cin), jnp.float32)
        xpad_ref[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cin), jnp.float32)
        xpad_ref[1 : h + 1, w + 1 :, :] = jnp.zeros((h, 1, cin), jnp.float32)
        xpad_ref[1 : h + 1, 1 : w + 1, :] = x_ref[0]
        for r in range(3):
            for s in range(3):
                patch = xpad_ref[r : r + h, s : s + w, :].reshape(h * w, cin)
                k = (3 * r + s) * cin
                col_ref[:, k : k + cin] = patch

    y = split_dot(col_ref[:], w9_ref[:], precision)
    tile_co = out_ref.shape[-1]
    y = y * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(h, w, tile_co)


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_co", "interpret", "precision")
)
def _direct_dense(x, w9, scale2d, bias2d, relu, tile_co, interpret, precision):
    n, h, w, cin = x.shape
    cout = w9.shape[1]
    n_j = cout // tile_co
    kernel = functools.partial(
        _direct_kernel, h=h, w=w, cin=cin, relu=relu, precision=precision
    )
    return pl.pallas_call(
        kernel,
        grid=(n, n_j),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, tile_co), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cin), jnp.float32),
            pltpu.VMEM((h * w, 9 * cin), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * 2 * h * w * 9 * cin * cout,
            bytes_accessed=4 * (n * h * w * (cin + cout) + 9 * cin * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w9, scale2d, bias2d)


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_co", "interpret", "precision")
)
def conv3x3_bn_direct_pallas(
    x: jax.Array,
    w9: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    *,
    tile_co: int | None = None,
    interpret: bool | None = None,
    precision: str = "bf16x3",
) -> jax.Array:
    """Fused 3x3 conv (pad 1) + BN + ReLU, direct im2col GEMM.

    x: (H, W, Cin) or (N, H, W, Cin); w9: (9*Cin, Cout) from direct_filter;
    scale, bias: (Cout,). Returns same spatial shape with Cout channels.

    Default precision "bf16x3" (split-operand, 3 single-pass MXU dots) is
    f32-faithful to ~1e-5 for unit-scale data — inside the reference's own
    accuracy envelope (report.pdf section 5) and the 1e-4 parity bar the
    harness enforces every run; pass precision="highest" for strict f32.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    assert w9.shape[0] == 9 * cin, (w9.shape, cin)
    cout = w9.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_co is None:
        if 9 * cin * cout * 4 <= 6 * 2**20:
            tile_co = cout
        else:
            from winograd_tpu.kernels.pointwise import mxu_lane_divisor

            tile_co = mxu_lane_divisor(cout, 128)
    assert cout % tile_co == 0, (cout, tile_co)
    out = _direct_dense(
        x.astype(jnp.float32),
        w9.astype(jnp.bfloat16 if precision == "bf16w" else jnp.float32),
        scale.reshape(1, cout).astype(jnp.float32),
        bias.reshape(1, cout).astype(jnp.float32),
        relu,
        tile_co,
        interpret,
        precision,
    )
    return out[0] if squeeze else out

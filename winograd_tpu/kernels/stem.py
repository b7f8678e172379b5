"""Fused ResNet stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool (rows) as ONE
Pallas kernel, with the stride-2 patch algebra of the space-to-depth route.

The reference has no stem (its scope is one bottleneck stage,
/root/reference/report.pdf section 1); this kernel serves the framework's
whole-classifier modes. It replaces the previous served route (XLA builds a
16x-expanded (ho, wo, 64*Cin) patch matrix in HBM — 9.6 MB for 224x224x3 —
then the pointwise GEMM re-reads it, then XLA maxpools), whose relayout alone
measured 61 us of the 109.5 us stem.

TPU-first structure:
* XLA does only the cheap part of the relayout: pad + space-to-depth by the
  stride (factor 2), concatenate the 4 width-shifts (K = 16*Cin = 48 lanes,
  4x the input bytes instead of 16x), and pre-stack per-grid-block 20-row
  halo slabs so every Pallas block is NON-overlapping, small (~1.1 MB), and
  pipelines against compute (overlapping-window BlockSpecs don't exist; a
  whole-image-resident input would double-buffer at ~13 MB).
* The kernel then does everything else in VMEM: the 4 height-shift patch
  GEMMs accumulated on the MXU (each a (17*wo, 16*Cin) x (16*Cin, C) dot —
  the a-th row-slice of the SAME w192_stem artifact the s2d route uses),
  the folded-BN FMA + ReLU epilogue, and the maxpool's ROW direction
  (stride-2 row selection is free here: splitting the untiled conv-row dim
  (16,...) -> (8,2,...) never touches the minor two dims, while the column
  direction would need a sublane-dim split — a Mosaic relayout).
* Pool padding rows and ceil-mode tail rows are zero-masked instead of
  -inf-masked: post-ReLU values are >= 0 and every pool window contains a
  valid element, so max(0, valid...) == max(valid...) exactly.
* The maxpool's COLUMN direction runs in XLA on the kernel's half-height
  output (reads wo x po x C, a quarter of the full conv map).

Tiers map to split_dot pass counts (kernels/direct.py): f32 -> "bf16x3"
(strict-bar faithful), bf16w -> "bf16w" (bf16 weights), int8 -> "bf16"
(the whole slab pipeline runs bfloat16 — half the relayout + stream bytes;
the stem's 37 KB of weights aren't worth int8 quantizing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels.direct import split_dot


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _stem_kernel(
    xb_ref, w_ref, scale_ref, bias_ref, out_ref, *, cin: int, ho: int,
    wo_pad: int, precision: str
):
    """One 8-pooled-row block: 4 accumulated patch GEMMs over the height
    shifts, BN+ReLU, validity masking, row-direction 3/2 maxpool."""
    j = pl.program_id(1)
    k = 16 * cin
    c = out_ref.shape[-1]
    slab = xb_ref[0, 0]  # (20, wo_pad, 16*cin): s2d rows 16j-1 .. 16j+18
    acc = None
    for a in range(4):
        sa = slab[a : a + 17].reshape(17 * wo_pad, k)
        d = split_dot(sa, w_ref[a * k : (a + 1) * k, :], precision)
        acc = d if acc is None else acc + d
    y = jnp.maximum(acc * scale_ref[:] + bias_ref[:], 0.0)
    y = y.reshape(17, wo_pad, c)
    # Conv row m of this block is global row 16j-1+m. Row -1 is the pool's
    # top padding; rows >= ho are ceil-mode bottom padding (garbage computed
    # from zero-padded s2d rows). Zero-masking both is exact post-ReLU.
    g = 16 * j - 1 + jax.lax.broadcasted_iota(jnp.int32, (17, 1, 1), 0)
    y = jnp.where((g >= 0) & (g < ho), y, 0.0)
    # Row pool p (local 0..7) = max over conv rows {2p, 2p+1, 2p+2} (local).
    pairs = y[0:16].reshape(8, 2, wo_pad, c)
    p3 = y[1:17].reshape(8, 2, wo_pad, c)[:, 1]
    out_ref[0] = jnp.maximum(jnp.maximum(pairs[:, 0], pairs[:, 1]), p3)


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret")
)
def stem_fused_pallas(
    x: jax.Array,
    w192: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    precision: str = "bf16x3",
    interpret: bool | None = None,
) -> jax.Array:
    """Whole stem, (..., H, W, Cin) -> (..., ceil(H/4), ceil(W/4), C).

    w192: (64*Cin, C) = models/resnet50.py::stem_filter_s2d(w7) — rows
    ordered (a, b, u, v, c) so the kernel's per-height-shift slice a is the
    contiguous row range [48a, 48a+48).
    precision: a split_dot mode — "bf16x3" (the f32 tier), "bf16w" (bf16
    weight storage), "bf16" (the int8-tier stem: bf16 end to end),
    "highest" (6-pass exact; differential checks).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, cin = x.shape
    c = w192.shape[1]
    assert w192.shape[0] == 64 * cin, (w192.shape, cin)
    ho, wo = -(-h // 2), -(-w // 2)
    po, qo = -(-ho // 2), -(-wo // 2)
    wo_pad = _cdiv(wo, 8) * 8
    nb = _cdiv(po, 8)
    if precision == "bf16":
        x = x.astype(jnp.bfloat16)
    # Pad + space-to-depth by the stride: every conv output keeps one cell
    # phase; channel order (u, v, c) matches stem_filter_s2d.
    hp, wp = 2 * (ho + 3), 2 * (wo_pad + 3)
    xp = jnp.pad(x, ((0, 0), (3, hp - 3 - h), (3, wp - 3 - w), (0, 0)))
    s2d = xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * cin)
    # Width shifts into the contraction dim (K = 16*cin), then one zero row
    # on top (conv row -1's source; masked in-kernel) and per-block 20-row
    # halo slabs so Pallas blocks never overlap.
    xb = jnp.concatenate(
        [s2d[:, :, b : b + wo_pad, :] for b in range(4)], axis=-1
    )
    rows_tot = 16 * (nb - 1) + 20
    xb = jnp.pad(xb, ((0, 0), (1, rows_tot - 1 - (ho + 3)), (0, 0), (0, 0)))
    xbs = jnp.stack([xb[:, 16 * j : 16 * j + 20] for j in range(nb)], axis=1)

    k = 16 * cin
    kernel = functools.partial(
        _stem_kernel, cin=cin, ho=ho, wo_pad=wo_pad, precision=precision
    )
    wk = w192.astype(
        jnp.bfloat16 if precision in ("bf16w", "bf16") else jnp.float32
    )
    rp = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 20, wo_pad, k),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((64 * cin, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, wo_pad, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8 * nb, wo_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * nb * 4 * 17 * wo_pad * k * c,
            bytes_accessed=xbs.size * xbs.dtype.itemsize + 4 * n * 8 * nb * wo_pad * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xbs,
        wk,
        scale.reshape(1, c).astype(jnp.float32),
        bias.reshape(1, c).astype(jnp.float32),
    )
    rp = rp[:, :po, :wo]
    # Column direction of the 3x3/2 maxpool (golden semantics: pad 1 left,
    # ceil output — reference.maxpool3x3_stride2).
    out = jax.lax.reduce_window(
        rp,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 3, 1),
        window_strides=(1, 1, 2, 1),
        padding=((0, 0), (0, 0), (1, wo % 2), (0, 0)),
    )
    return out[0] if squeeze else out

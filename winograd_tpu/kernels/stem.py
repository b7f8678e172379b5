"""Fused ResNet stem: 7x7/2 conv + BN + ReLU + FULL 3x3/2 maxpool as ONE
Pallas kernel, with the stride-2 patch algebra of the space-to-depth route.

The reference has no stem (its scope is one bottleneck stage,
/root/reference/report.pdf section 1); this kernel serves the framework's
whole-classifier modes. Structure (v2 — measured v1 at 114.8 us split
58 us XLA relayout / 31 us kernel / 20 us XLA column pool):

* XLA builds ONE fused operand and nothing else: pad spatially, space-to-
  depth by the stride, concatenate the 4 width shifts (K = 16*Cin = 48
  lanes). No halo pre-stacking pass and no separate pool pass. Two
  measured dead ends on this producer (2026-08-18): (a) padding cin
  3 -> 8 first for an all-useful-lanes 128-wide operand made the XLA
  transpose-fusion ~2x SLOWER (~124 us vs ~50 — the fusion's cost is
  gather-emission, not bytes; the 48-lane operand occupies the same
  physical 128-lane tiles anyway); (b) moving the s2d into the kernel is
  structurally impossible — Mosaic cannot split a value's lane dim
  ("infer-vector-layout: unsupported shape cast"), and every sub-128-lane
  HBM layout pays 8x-2.7x physical tile padding, so the patch matrix
  cannot be formed from a dense raw-image operand in VMEM.
* The kernel manually DMAs its 20-row halo slab out of the ANY-space
  operand (double-buffered: block j+1's copy is issued before block j's
  compute, so the stream overlaps the MXU work) — overlapping-window
  BlockSpecs don't exist, and the v1 halo pre-stack cost a full extra
  HBM materialization.
* In VMEM: the 4 height-shift patch GEMMs accumulated on the MXU (each a
  (17*wo, 16*Cin) x (16*Cin, C) dot — the a-th row-slice of the SAME
  w192_stem artifact the s2d route uses), the folded-BN FMA + ReLU
  epilogue, and BOTH maxpool directions. Row direction: stride-2 row
  selection is free on the untiled conv-row dim. Column direction:
  stride-2 column selection runs as pl.Slice strided reads on a VMEM
  scratch ref (minor dim C=64 <= one lane tile, the case Mosaic lowers).
* Pool padding rows/cols and ceil-mode tails are zero-masked instead of
  -inf-masked: post-ReLU values are >= 0 and every pool window contains a
  valid element, so max(0, valid...) == max(valid...) exactly.

Tiers map to split_dot pass counts (kernels/direct.py): f32 -> "bf16x3"
(strict-bar faithful), bf16w -> "bf16w" (bf16 weights), int8 -> "bf16"
(the whole slab pipeline runs bfloat16 — half the relayout + stream
bytes; the stem's 37 KB of weights aren't worth int8 quantizing).
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
    xb_hbm,     # (N, 16*nb+4, wo_pad, 16*cin) in ANY — manually DMA'd halos
    w_ref,      # (64*cin, C)
    scale_ref,  # (1, C)
    bias_ref,   # (1, C)
    out_ref,    # (1, 8, wo_pad//2, C) — fully pooled rows AND columns
    slab_ref,   # scratch (2, 20, wo_pad, 16*cin) — double-buffered halo slabs
    rp_ref,     # scratch (8, wo_pad, C) — row-pooled map for strided col reads
    sem,        # DMA semaphores (2,)
    *,
    ho: int,
    wo: int,
    nb: int,
    precision: str,
):
    """One 8-pooled-row block: DMA the 20-row halo slab (s2d rows
    16j-1 .. 16j+18), 4 accumulated height-shift patch GEMMs, BN+ReLU,
    validity masking, then the full 3x3/2 maxpool (rows, then columns via
    strided scratch reads)."""
    i, j = pl.program_id(0), pl.program_id(1)
    k = slab_ref.shape[-1]
    wo_pad = slab_ref.shape[-2]
    qo_pad = wo_pad // 2
    c = out_ref.shape[-1]

    def _copy(jj, slot):
        return pltpu.make_async_copy(
            xb_hbm.at[i, pl.ds(16 * jj, 20)], slab_ref.at[slot], sem.at[slot]
        )

    @pl.when(j == 0)
    def _first():
        _copy(0, 0).start()

    @pl.when(j + 1 < nb)
    def _prefetch():
        _copy(j + 1, (j + 1) % 2).start()

    _copy(j, j % 2).wait()
    slab = slab_ref[j % 2]

    acc = None
    for a in range(4):
        sa = slab[a : a + 17].reshape(17 * wo_pad, k)
        d = split_dot(sa, w_ref[a * k : (a + 1) * k, :], precision)
        acc = d if acc is None else acc + d
    y = jnp.maximum(acc * scale_ref[:] + bias_ref[:], 0.0)
    y = y.reshape(17, wo_pad, c)
    # Conv row m of this block is global row 16j-1+m. Row -1 is the pool's
    # top padding; rows >= ho are ceil-mode bottom padding (garbage computed
    # from zero-padded s2d rows). Columns >= wo likewise. Zero-masking all
    # of them is exact post-ReLU.
    g = 16 * j - 1 + jax.lax.broadcasted_iota(jnp.int32, (17, 1, 1), 0)
    y = jnp.where((g >= 0) & (g < ho), y, 0.0)
    if wo != wo_pad:
        q = jax.lax.broadcasted_iota(jnp.int32, (1, wo_pad, 1), 1)
        y = jnp.where(q < wo, y, 0.0)
    # Row pool p (local 0..7) = max over conv rows {2p, 2p+1, 2p+2} (local).
    pairs = y[0:16].reshape(8, 2, wo_pad, c)
    p3 = y[1:17].reshape(8, 2, wo_pad, c)[:, 1]
    rp_ref[:] = jnp.maximum(jnp.maximum(pairs[:, 0], pairs[:, 1]), p3)
    # Column pool q = max over conv cols {2q-1, 2q, 2q+1}; col -1 is the
    # pool's left padding (golden semantics: pad 1 left, ceil output —
    # reference.maxpool3x3_stride2). Strided column selection happens as
    # pl.Slice REF reads (values can't stride; refs can at minor <= 128).
    ev = rp_ref[:, pl.Slice(0, qo_pad, 2), :]
    od = rp_ref[:, pl.Slice(1, qo_pad, 2), :]
    left = jnp.concatenate([jnp.zeros((8, 1, c), od.dtype), od[:, :-1]], axis=1)
    out_ref[0] = jnp.maximum(jnp.maximum(ev, od), left)


@functools.partial(jax.jit, static_argnames=("precision",))
def stem_prepare_input(x: jax.Array, *, precision: str = "bf16x3") -> jax.Array:
    """The stem's input-layout producer: raw image(s) (..., H, W, Cin) ->
    the (N, 16*nb+4, wo_pad, ceil(16*Cin/128)*128) halo-ready s2d patch
    operand the kernel DMAs from. Jittable on device (the served default),
    but ALSO the engine's host-side preprocessed-input contract: run it on
    CPU in the input pipeline (the offline-transform philosophy applied to
    layout, like the reference ships pre-transformed filters,
    data_generator.py:63-78) and serve via stem_fused_pallas_pre, and the
    device never pays the ~50-65 us gather-emission relayout."""
    if x.ndim == 3:
        x = x[None]
    n, h, w, cin = x.shape
    ho, wo = -(-h // 2), -(-w // 2)
    po = -(-ho // 2)
    wo_pad = _cdiv(wo, 8) * 8
    nb = _cdiv(po, 8)
    k = 16 * cin

    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # Pad + space-to-depth by the stride: every conv output keeps one cell
    # phase; channel order (u, v, c) matches stem_filter_s2d. MEASURED
    # (2026-08-18): padding cin 3 -> 8 first (a 128-lane operand, all
    # lanes useful) made the GEMM ideal but the XLA transpose-fusion ~2x
    # SLOWER (124 us vs ~50 for the whole producer) — the fusion's cost is
    # gather-emission, not bytes. The 12-channel transpose + 48-lane
    # concat is the cheapest producer found; the 48-lane operand occupies
    # the same physical 128-lane tiles either way.
    hp, wp = 2 * (ho + 3), 2 * (wo_pad + 3)
    xp = jnp.pad(
        x.astype(dt), ((0, 0), (3, hp - 3 - h), (3, wp - 3 - w), (0, 0))
    )
    s2d = xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * cin)
    # Width shifts into the contraction dim (K = 16*cin), one zero row on
    # top (conv row -1's source; masked in-kernel), bottom rows to cover
    # the last block's 20-row halo. The kernel DMAs overlapping halo slabs
    # itself — no pre-stacking materialization.
    xb = jnp.concatenate(
        [s2d[:, :, b : b + wo_pad, :] for b in range(4)], axis=-1
    )
    rows_tot = 16 * nb + 4
    # Manual DMA slices must be lane-tile aligned ("Slice shape along
    # dimension 3 must be aligned to tiling (128)"), so the K axis is
    # zero-padded up to the lane tile AFTER the concat — explicit zeros in
    # lanes the 48-wide array's physical tiles contained anyway, with the
    # cheap 12-channel gather pattern untouched. Weight rows pad to match.
    kp = _cdiv(k, 128) * 128
    return jnp.pad(
        xb, ((0, 0), (1, rows_tot - 1 - (ho + 3)), (0, 0), (0, kp - k))
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "precision", "interpret")
)
def stem_fused_pallas_pre(
    xb: jax.Array,
    w192: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    h: int,
    w: int,
    precision: str = "bf16x3",
    interpret: bool | None = None,
) -> jax.Array:
    """The stem kernel on a PREPARED operand (stem_prepare_input) —
    the preprocessed-input serving contract: (N, rows, wo_pad, kp) ->
    (N, ceil(H/4), ceil(W/4), C). h/w are the ORIGINAL image dims (static;
    they set the valid-region masks)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = xb.shape[0]
    c = w192.shape[1]
    cin = w192.shape[0] // 64
    ho, wo = -(-h // 2), -(-w // 2)
    po, qo = -(-ho // 2), -(-wo // 2)
    wo_pad = _cdiv(wo, 8) * 8
    qo_pad = wo_pad // 2
    nb = _cdiv(po, 8)
    k = 16 * cin
    kp = _cdiv(k, 128) * 128
    assert xb.shape[1:] == (16 * nb + 4, wo_pad, kp), (xb.shape, nb, wo_pad, kp)
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32

    wk = w192.reshape(4, k, c)
    wk = jnp.pad(wk, ((0, 0), (0, kp - k), (0, 0))).reshape(4 * kp, c)
    wk = wk.astype(
        jnp.bfloat16 if precision in ("bf16w", "bf16") else jnp.float32
    )

    kernel = functools.partial(
        _stem_kernel, ho=ho, wo=wo, nb=nb, precision=precision
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * kp, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, qo_pad, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8 * nb, qo_pad, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 20, wo_pad, kp), dt),
            pltpu.VMEM((8, wo_pad, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * nb * 4 * 17 * wo_pad * kp * c,
            bytes_accessed=xb.size * xb.dtype.itemsize
            + 4 * n * 8 * nb * qo_pad * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xb,
        wk,
        scale.reshape(1, c).astype(jnp.float32),
        bias.reshape(1, c).astype(jnp.float32),
    )
    return out[:, :po, :qo]


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def stem_fused_pallas(
    x: jax.Array,
    w192: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    precision: str = "bf16x3",
    interpret: bool | None = None,
) -> jax.Array:
    """Whole stem, (..., H, W, Cin) -> (..., ceil(H/4), ceil(W/4), C):
    the layout producer (stem_prepare_input) + the halo-DMA kernel
    (stem_fused_pallas_pre) fused under one jit.

    w192: (64*Cin, C) = models/resnet50.py::stem_filter_s2d(w7) — rows
    ordered (a, b, u, v, c) so the kernel's per-height-shift slice a is the
    contiguous row range [16*Cin*a, 16*Cin*(a+1)).
    precision: a split_dot mode — "bf16x3" (the f32 tier), "bf16w" (bf16
    weight storage), "bf16" (the int8-tier stem: bf16 end to end),
    "highest" (6-pass exact; differential checks).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h, w = x.shape[1], x.shape[2]
    xb = stem_prepare_input(x, precision=precision)
    out = stem_fused_pallas_pre(
        xb, w192, scale, bias, h=h, w=w, precision=precision,
        interpret=interpret,
    )
    return out[0] if squeeze else out

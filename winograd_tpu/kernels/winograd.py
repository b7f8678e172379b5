"""Fused F(m x m, 3x3) Winograd conv + folded-BN + ReLU — ONE Pallas TPU kernel.

The reference implements this as THREE CUDA kernels that round-trip the tile
matrices through global memory between phases (input transform
kernel_*_winograd_BtdB, 36 tile GEMMs kernel_*_OuterProduct_*, inverse
transform + epilogue kernel_*_winograd_AtIA —
/root/reference/Kernel128_winograd.cu:26-213, buffers t_input/ip at :240-241).

Here all three phases run inside a single Pallas kernel and every
intermediate — including the zero-padded input staging — lives in VMEM
scratch for its entire lifetime: the op reads the dense (H, W, Cin) NHWC
activation from HBM exactly once and writes the dense (H, W, Cout) result
exactly once. The math is restructured for the MXU rather than translated
(structure chosen by on-chip A/B measurement, ~2.4x over the naive
one-matmul-per-tile form):

* Padding: conv padding + tile-grid overhang are materialized in a VMEM
  scratch (border strips zeroed, interior copied) — no HBM-level pad/crop
  copies (the reference instead doubles + zeroes its global input buffer,
  Kernel128_winograd.cu:236-242, and writes a padded output with a +1 shift
  and per-tile branch masking, :155,171,177).
* Tile extraction: each (a, a, C) patch is a static slice reshaped to
  (a^2, C) and written to a lane-concatenated staging buffer D (a^2, NT*C)
  — channel-aligned lane slices, no shuffles.
* Input transform: vec(Bt d Bt^T) = (Bt (x) Bt) vec(d) vectorized over ALL
  tiles at once: ONE (a^2, a^2) x (a^2, NT*C) MXU matmul (the reference
  stages 6-row passes through 18 KB of CUDA shared memory per tile).
* Tile GEMMs: one batched dot_general over the a^2 positions,
  (NT, Cin) x (Cin, Cout) per position against the offline-transformed
  filter U[a^2, Cin, Cout] — the reference's hot loop
  (Kernel128_winograd.cu:197-210) — with f32 accumulation.
* Inverse transform + epilogue: vec(At M At^T) = (At (x) At) vec(M), again
  ONE (m^2, a^2) x (a^2, NT*Cout) matmul for all tiles, then the folded-BN
  FMA and ReLU on the way to the output block, edge tiles stored with
  statically clipped slices.

Both Winograd algebras are first-class (m inferred from the filter
artifact): F(4x4,3x3) minimizes FLOPs (16 tiles on 14x14, like the
reference); F(2x2,3x3) yields 49 tiles — 3x better MXU row utilization per
position GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels import transforms


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# MXU precision policy. The parity bar is max abs err < 1e-4 vs the float64
# numpy golden model (BASELINE.json); "default" (single-pass bf16 inputs)
# misses it by ~100x, "highest" (multi-pass) is full f32. Mosaic supports
# only these two.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _dot_kw(precision: str):
    return dict(
        preferred_element_type=jnp.float32, precision=_PRECISIONS[precision]
    )


def _winograd_kernel(
    x_ref,       # (NB, H, W, Cin)    dense input, NB images per grid step
    u_ref,       # (a2, Cin, TILE_CO) transformed filter slice
    bb_ref,      # (a2, a2)           Bt (x) Bt
    aa_ref,      # (m2, a2)           At (x) At
    scale_ref,   # (1, TILE_CO)
    bias_ref,    # (1, TILE_CO)
    out_ref,     # (NB, H, W, TILE_CO)
    xpad_ref,    # scratch (NB, mT+2, mT+2, Cin)  zero-padded staging
    d_ref,       # scratch (a2, NB*NT*Cin)        lane-concat tile staging
    v_ref,       # scratch (a2, NB*NT, Cin)       transformed tiles, GEMM layout
    m_ref,       # scratch (a2, NB*NT, TILE_CO)
    mf_ref,      # scratch (a2, NB*NT*TILE_CO)
    *,
    m: int,
    nb: int,
    tiles_h: int,
    tiles_w: int,
    h: int,
    w: int,
    cin: int,
    relu: bool,
    precision: str,
):
    dot_kw = _dot_kw(precision)
    a = m + 2
    a2 = a * a
    nt = tiles_h * tiles_w
    side_h = m * tiles_h
    side_w = m * tiles_w
    j = pl.program_id(1)

    # Phase 0+1 — pad into VMEM, extract tiles, input transform as ONE
    # matmul over all NB*NT tiles. Tiles of all NB images share one GEMM
    # row block, so the per-position tile GEMMs see NB*NT rows — at NB=8,
    # NT=16 that is a full 128-row MXU block (the key throughput lever the
    # per-image reference kernels cannot express). Only needed once per
    # image block; skipped when revisiting the same x for another
    # output-channel slice (j > 0).
    @pl.when(j == 0)
    def _input_transform():
        for b in range(nb):
            # Zero only the border strips, copy the interior once.
            xpad_ref[b, 0:1, :, :] = jnp.zeros((1, side_w + 2, cin), jnp.float32)
            xpad_ref[b, h + 1 :, :, :] = jnp.zeros((side_h + 1 - h, side_w + 2, cin), jnp.float32)
            xpad_ref[b, 1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cin), jnp.float32)
            xpad_ref[b, 1 : h + 1, w + 1 :, :] = jnp.zeros((h, side_w + 1 - w, cin), jnp.float32)
            xpad_ref[b, 1 : h + 1, 1 : w + 1, :] = x_ref[b]

        for b in range(nb):
            for t in range(nt):
                th, tw = divmod(t, tiles_w)
                patch = xpad_ref[b, th * m : th * m + a, tw * m : tw * m + a, :]
                g = b * nt + t
                d_ref[:, g * cin : (g + 1) * cin] = patch.reshape(a2, cin)
        vf = jnp.dot(bb_ref[:], d_ref[:], **dot_kw)  # (a2, NB*NT*Cin)
        for g in range(nb * nt):
            v_ref[:, g, :] = vf[:, g * cin : (g + 1) * cin]

    # Phase 2 — batched per-position tile GEMMs on the MXU (the hot loop).
    m_ref[:] = jax.lax.dot_general(
        v_ref[:],
        u_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        **dot_kw,
    )

    # Phase 3 — inverse transform as ONE matmul, then BN FMA + ReLU;
    # edge tiles stored with statically clipped slices (no output crop).
    tile_co = out_ref.shape[-1]
    for g in range(nb * nt):
        mf_ref[:, g * tile_co : (g + 1) * tile_co] = m_ref[:, g, :]
    yf = jnp.dot(aa_ref[:], mf_ref[:], **dot_kw)  # (m2, NB*NT*TILE_CO)
    scale = scale_ref[:]
    bias = bias_ref[:]
    for b in range(nb):
        for t in range(nt):
            th, tw = divmod(t, tiles_w)
            g = b * nt + t
            y = yf[:, g * tile_co : (g + 1) * tile_co] * scale + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            y = y.reshape(m, m, tile_co)
            rh = min(m, h - th * m)
            rw = min(m, w - tw * m)
            out_ref[b, th * m : th * m + rh, tw * m : tw * m + rw, :] = y[:rh, :rw]


@functools.partial(
    jax.jit,
    static_argnames=(
        "relu", "m", "nb", "tiles_h", "tiles_w", "tile_co", "interpret", "precision"
    ),
)
def _winograd_dense(
    x: jax.Array,       # (N, H, W, Cin) dense
    u: jax.Array,       # (a2, Cin, Cout)
    bb: jax.Array,      # (a2, a2)
    aa: jax.Array,      # (m2, a2)
    scale2d: jax.Array,  # (1, Cout)
    bias2d: jax.Array,   # (1, Cout)
    relu: bool,
    m: int,
    nb: int,
    tiles_h: int,
    tiles_w: int,
    tile_co: int,
    interpret: bool,
    precision: str,
) -> jax.Array:
    n, h, w, cin = x.shape
    a2 = (m + 2) * (m + 2)
    m2 = m * m
    cout = u.shape[2]
    nt = tiles_h * tiles_w
    side_h, side_w = m * tiles_h, m * tiles_w
    n_j = cout // tile_co

    kernel = functools.partial(
        _winograd_kernel,
        m=m,
        nb=nb,
        tiles_h=tiles_h,
        tiles_w=tiles_w,
        h=h,
        w=w,
        cin=cin,
        relu=relu,
        precision=precision,
    )
    flops = n * (2 * a2 * nt * cin * cout + 2 * nt * a2 * (a2 * cin + m2 * cout))
    return pl.pallas_call(
        kernel,
        grid=(n // nb, n_j),
        in_specs=[
            pl.BlockSpec((nb, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a2, cin, tile_co), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((a2, a2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, a2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, h, w, tile_co), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb, side_h + 2, side_w + 2, cin), jnp.float32),
            pltpu.VMEM((a2, nb * nt * cin), jnp.float32),
            pltpu.VMEM((a2, nb * nt, cin), jnp.float32),
            pltpu.VMEM((a2, nb * nt, tile_co), jnp.float32),
            pltpu.VMEM((a2, nb * nt * tile_co), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (n * h * w * cin + a2 * cin * cout + n * h * w * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, u, bb, aa, scale2d, bias2d)


def _vmem_bytes(
    m: int, nb: int, tiles_h: int, tiles_w: int, h: int, w: int, cin: int, tile_co: int
) -> int:
    """Estimated kernel VMEM: scratch + double-buffered in/out/u blocks."""
    a2 = (m + 2) * (m + 2)
    nt = tiles_h * tiles_w
    pad_hw = (m * tiles_h + 2) * (m * tiles_w + 2)
    scratch = nb * pad_hw * cin + 2 * a2 * nb * nt * cin + 2 * a2 * nb * nt * tile_co
    blocks = 2 * (nb * h * w * (cin + tile_co) + a2 * cin * tile_co)
    return 4 * (scratch + blocks)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "nb", "tile_co", "interpret", "precision"),
)
def conv3x3_bn_winograd_pallas(
    x: jax.Array,
    u: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    *,
    nb: int | None = None,
    tile_co: int | None = None,
    interpret: bool | None = None,
    precision: str = "highest",
) -> jax.Array:
    """Fused 3x3 conv (pad 1, stride 1) + BN + ReLU via Winograd F(m,3).

    x: (H, W, Cin) or (N, H, W, Cin) float32;
    u: (a^2, Cin, Cout) offline-transformed filters
       (transforms.transform_filter — same on-disk layout as the reference's
       weight_winograd_*.bin, data_generator.py:63-78). The Winograd tile
       size m is inferred from a^2: 36 -> F(4x4,3x3), 16 -> F(2x2,3x3);
    scale, bias: (Cout,) offline-folded BN parameters.
    Returns the same spatial shape with Cout channels.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    assert u.shape[1] == cin, (u.shape, cin)
    m = {36: 4, 16: 2}.get(u.shape[0])
    assert m is not None, f"filter leading dim {u.shape[0]} is not 36 (F(4,3)) or 16 (F(2,3))"
    cout = u.shape[2]
    tiles_h, tiles_w = _cdiv(h, m), _cdiv(w, m)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Output-channel slicing keeps the resident U slice + scratch within a
    # VMEM budget (~5 MB for U at Cin=256, tile_co=128).
    a2 = u.shape[0]
    if tile_co is None:
        if a2 * cin * cout * 4 <= 5 * 2**20:
            tile_co = cout
        else:
            from winograd_tpu.kernels.pointwise import largest_divisor_leq

            tile_co = largest_divisor_leq(cout, 128)
    assert cout % tile_co == 0, (cout, tile_co)

    # Images per grid step: grow the tile-GEMM row block toward the MXU's
    # 128 rows (NT rows per image), bounded by a VMEM budget on the five
    # scratch buffers.
    nt = tiles_h * tiles_w
    if nb is None:
        nb = 1
        while (
            nb * 2 <= n
            and n % (nb * 2) == 0
            and nb * 2 * nt <= 128
            and _vmem_bytes(m, nb * 2, tiles_h, tiles_w, h, w, cin, tile_co)
            <= 14 * 2**20
        ):
            nb *= 2
    assert n % nb == 0, (n, nb)

    bb = jnp.asarray(transforms.bt_kron(np.float32, m=m))
    aa = jnp.asarray(transforms.at_kron(np.float32, m=m))
    out = _winograd_dense(
        x.astype(jnp.float32),
        u.astype(jnp.float32),
        bb,
        aa,
        scale.reshape(1, cout).astype(jnp.float32),
        bias.reshape(1, cout).astype(jnp.float32),
        relu,
        m,
        nb,
        tiles_h,
        tiles_w,
        tile_co,
        interpret,
        precision,
    )
    return out[0] if squeeze else out

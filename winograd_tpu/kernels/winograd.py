"""Fused F(m x m, 3x3) Winograd conv + folded-BN + ReLU — ONE Pallas TPU kernel.

The reference implements this as THREE CUDA kernels that round-trip the tile
matrices through global memory between phases (input transform
kernel_*_winograd_BtdB, 36 tile GEMMs kernel_*_OuterProduct_*, inverse
transform + epilogue kernel_*_winograd_AtIA —
/root/reference/Kernel128_winograd.cu:26-213, buffers t_input/ip at :240-241).

Here all three phases run inside a single Pallas kernel; the only explicit
memory staging is one zero-padded copy of the input into VMEM scratch. The
structure is chosen for the MXU/VPU, not translated (round-2 redesign: the
round-1 kernel staged tiles through lane-concatenated VMEM buffers with one
small copy per tile — `nb*nt` unrolled copies per phase — and was measured
copy-bound; this version has ZERO per-tile copies):

* Tile extraction: ONE strided-slice read per tile position q = (qi, qj) —
  `xpad[:, qi::m, qj::m, :]` yields the q-th element of EVERY tile at once
  (a^2 = 16 or 36 reads total, independent of the tile count). The CUDA
  analog (per-tile smem staging, Kernel128_winograd.cu:36-119) has no
  reason to exist on TPU.
* Input transform Bt d Bt^T: SEPARABLE row pass then column pass over the
  position axis, unrolled on values with the constant matrix entries baked
  in (zero entries skipped). For F(2,3) every entry is +-1, so the entire
  transform is pure VPU adds; for F(4,3) it is small-constant FMAs. No
  matmul, no staging buffer, no relayout.
* Tile GEMMs (the reference's hot loop, Kernel128_winograd.cu:197-210):
  one (tiles, Cin) x (Cin, Cout) MXU dot per position against the
  offline-transformed filter U[a^2, Cin, Cout], f32 accumulation. All
  images of the grid step share one row block (batch grows MXU rows).
* Inverse transform At M At^T: separable value passes again, then the
  folded-BN FMA (+ReLU) epilogue and ONE strided-slice store per output
  position — edge overhang (F(4,3) covers 16x16 of a 14x14 map) is clipped
  statically per position, replacing the reference's per-tile branch
  masking (Kernel128_winograd.cu:155,171,177).

Both Winograd algebras are first-class (m inferred from the filter
artifact): F(2x2,3x3) — 49 tiles on 14x14, 3x the MXU rows per position
GEMM and +-1 transforms, the fast choice at inference batch sizes — and
F(4x4,3x3) (16 tiles, like the reference) which minimizes FLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels import transforms
from winograd_tpu.kernels.direct import split_dot


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_tiles_w(tw: int) -> int:
    """Pad the tile count along W to a sublane multiple when the row waste
    is small: (th, tw', C) -> (th*tw', C) value reshapes become free
    relabels (the minor (tw', C) dims form whole 8x128 tiles), removing the
    per-position relayout copies. The padded tiles read zeros and their
    outputs are clipped at store time."""
    tw8 = _cdiv(tw, 8) * 8
    return tw8 if tw8 * 3 <= tw * 4 else tw


def _apply_const_matrix(mat: np.ndarray, vals: list) -> list:
    """out[p] = sum_q mat[p, q] * vals[q], unrolled with constants baked in.

    Zero entries are skipped and +-1 entries become adds/subs, so for the
    F(2,3) matrices this lowers to pure VPU adds on (rows, C) values.
    """
    out = []
    for p in range(mat.shape[0]):
        acc = None
        for q in range(mat.shape[1]):
            c = float(mat[p, q])
            if c == 0.0:
                continue
            if c == 1.0:
                term = vals[q]
            elif c == -1.0:
                term = -vals[q]
            else:
                term = c * vals[q]
            acc = term if acc is None else acc + term
        assert acc is not None, "transform matrix has an all-zero row"
        out.append(acc)
    return out


def _apply_separable(mat: np.ndarray, grid: list) -> list:
    """Apply `mat` along both axes of a 2D list of values: mat G mat^T.

    grid[qi][qj] are (rows, C) values; returns out[pi][pj] lists of
    shape (mat.shape[0], mat.shape[0])."""
    # Row pass: e[p][qj] = sum_qi mat[p, qi] grid[qi][qj]
    ncol = len(grid[0])
    cols = [[grid[qi][qj] for qi in range(len(grid))] for qj in range(ncol)]
    e_cols = [_apply_const_matrix(mat, col) for col in cols]  # [qj][p]
    # Column pass: v[p][pj] = sum_qj mat[pj, qj] e[p][qj]
    nout = mat.shape[0]
    out = []
    for p in range(nout):
        row = [e_cols[qj][p] for qj in range(ncol)]
        out.append(_apply_const_matrix(mat, row))
    return out


def winograd_input_transform(xpads, *, m: int, tiles_h: int, tw_pad: int, nb: int = 1):
    """Phase 1 core: a^2 strided-slice reads per <=128-lane staging group +
    separable Bt passes. xpads: list of zero-padded (NB, mTh+2, mTw'+2, CG)
    refs. Returns v_groups[g][pi][pj] values of shape (NB*th*tw', CG).
    Reused by the standalone conv kernel AND the block/stage megakernels
    (kernels/block.py) — the fused-block 3x3 is the same math."""
    a = m + 2
    rows = nb * tiles_h * tw_pad
    bt = np.asarray(transforms.matrices(m)[0], np.float64)
    out = []
    for xp in xpads:
        cg = xp.shape[-1]
        d = [
            [
                xp[
                    :, pl.Slice(qi, tiles_h, m), pl.Slice(qj, tw_pad, m), :
                ].reshape(rows, cg)
                for qj in range(a)
            ]
            for qi in range(a)
        ]
        out.append(_apply_separable(bt, d))
    return out


def winograd_gemm_inverse(v_groups, u_ref, *, m: int, cg: int, precision: str):
    """Phases 2+3 core: per-position tile GEMMs (contraction split over the
    channel groups) + separable At passes. u_ref: (a^2, Cin, Cout_tile).
    Returns y[oi][oj] values of shape (rows, Cout_tile), pre-epilogue."""
    a = m + 2
    mm = [
        [
            functools.reduce(
                lambda acc, g: acc
                + split_dot(
                    v_groups[g][pi][pj],
                    u_ref[pi * a + pj, g * cg : (g + 1) * cg, :],
                    precision,
                ),
                range(1, len(v_groups)),
                split_dot(
                    v_groups[0][pi][pj], u_ref[pi * a + pj, 0:cg, :], precision
                ),
            )
            for pj in range(a)
        ]
        for pi in range(a)
    ]
    return _apply_separable(np.asarray(transforms.matrices(m)[2], np.float64), mm)


def winograd_stage_input(
    x_ref, xpads, v_ref, *, m: int, nb: int, tiles_h: int, tw_pad: int,
    h: int, w: int, cg: int, j=None
):
    """Phases 0+1 shared by the f32 and int8 standalone kernels: pad the
    dense input into VMEM scratch once per image block (grid axis 1 must be
    the output-channel axis — the pad/stash run at j == 0), transform, and
    when output channels are tiled (v_ref given) stash/reload V so later j
    steps skip the transform. Returns v_groups[g][pi][pj] f32 values.

    j: the output-channel grid index, passed in by callers that invoke this
    from INSIDE a pl.when body (pl.program_id cannot be bound inside the
    lowered cond on the interpret backend); defaults to program_id(1)."""
    a = m + 2
    side_h = m * tiles_h
    side_w = m * tw_pad
    if j is None:
        j = pl.program_id(1)

    # Phase 0 — pad into VMEM once per image block (border strips zeroed,
    # interior copied; the reference instead doubles + zeroes its global
    # input buffer, Kernel128_winograd.cu:236-242). The staging is split
    # into <=128-channel groups because Mosaic's strided vector loads/stores
    # only lower when the ref's minor dim is a single lane tile.
    @pl.when(j == 0)
    def _pad():
        for g, xp in enumerate(xpads):
            gsl = slice(g * cg, (g + 1) * cg)
            xp[:, 0:1, :, :] = jnp.zeros((nb, 1, side_w + 2, cg), jnp.float32)
            xp[:, h + 1 :, :, :] = jnp.zeros(
                (nb, side_h + 1 - h, side_w + 2, cg), jnp.float32
            )
            xp[:, 1 : h + 1, 0:1, :] = jnp.zeros((nb, h, 1, cg), jnp.float32)
            xp[:, 1 : h + 1, w + 1 :, :] = jnp.zeros(
                (nb, h, side_w + 1 - w, cg), jnp.float32
            )
            xp[:, 1 : h + 1, 1 : w + 1, :] = x_ref[:, :, :, gsl]

    if v_ref is None:
        return winograd_input_transform(
            xpads, m=m, tiles_h=tiles_h, tw_pad=tw_pad, nb=nb
        )

    # Output-channel slicing revisits the same image block: stash V in
    # scratch at j == 0, reload on later j steps.
    @pl.when(j == 0)
    def _stash():
        vv_groups = winograd_input_transform(
            xpads, m=m, tiles_h=tiles_h, tw_pad=tw_pad, nb=nb
        )
        for g, vv in enumerate(vv_groups):
            for pi in range(a):
                for pj in range(a):
                    v_ref[pi * a + pj, :, g * cg : (g + 1) * cg] = vv[pi][pj]

    return [
        [
            [
                v_ref[pi * a + pj, :, g * cg : (g + 1) * cg]
                for pj in range(a)
            ]
            for pi in range(a)
        ]
        for g in range(len(xpads))
    ]


def winograd_store_epilogue(
    y, out_ref, scale, bias, *, relu: bool, m: int, nb: int, tiles_h: int,
    tiles_w: int, tw_pad: int, h: int, w: int
):
    """Folded-BN FMA (+ReLU) epilogue and ONE strided-slice store per output
    position, edge overhang clipped statically (replaces the reference's
    per-tile branch masking, Kernel128_winograd.cu:155,171,177)."""
    tile_co = out_ref.shape[-1]
    for oi in range(m):
        th_v = min(tiles_h, (h - 1 - oi) // m + 1)
        for oj in range(m):
            tw_v = min(tiles_w, (w - 1 - oj) // m + 1)
            yy = y[oi][oj] * scale + bias
            if relu:
                yy = jnp.maximum(yy, 0.0)
            yy = yy.reshape(nb, tiles_h, tw_pad, tile_co)
            out_ref[
                :, pl.Slice(oi, th_v, m), pl.Slice(oj, tw_v, m), :
            ] = yy[:, :th_v, :tw_v, :]


def _winograd_kernel_p64(
    x_ref,       # (NB, H, W, 64)     dense input
    u_ref,       # (16, 64, 64)       transformed filter, F(2,3)
    scale_ref,   # (1, 128)           folded BN scale, tiled x2 over lanes
    bias_ref,    # (1, 128)
    out_ref,     # (NB, H, W, 64)
    z_even,      # scratch (NB, H+2, 2*NPP, 128) packed staging, qj even
    z_odd,       # scratch (NB, H+2, 2*NPP, 128) packed staging, qj odd
    up_ref,      # scratch (16, 128, 128)        block-diag packed filter
    *,
    nb: int,
    tiles_h: int,
    npp: int,
    h: int,
    w: int,
    relu: bool,
    precision: str,
):
    """Lane-packed F(2,3) kernel for 64-channel convs (ResNet-18/34
    conv2_x): TWO adjacent tile columns share one 128-lane tile, so every
    transform value runs at full lane width and the per-position GEMM is
    (rows, 128) x (128, 128) block-diag instead of the quarter-utilized
    (2*rows, 64) x (64, 64) — the MXU array is 128x128, so a 64-channel
    dot wastes 3/4 of it. Measured 9.0 -> 6.2 us at 56x56x64 f32
    (bf16w 6.6 -> 5.2; tools/exp_basicroute.py, 2026-08-19).

    Packing: tile pair T = tile columns (2T, 2T+1). The d-read for
    position (qi, qj) needs padded input column 4T+qj (left tile) and
    4T+2+qj (right). Staging buffer z_p (p = qj mod 2) holds at column u
    the lane-concat [padded col 2u+p | padded col 2u+2+p], so the read is
    ONE strided slice z_p[:, qi::2, s::2, :] with s = qj//2 — both tiles'
    d arrive pre-packed, no per-position lane concat ever happens.
    """
    a = 4
    i = pl.program_id(0)
    wdt = up_ref.dtype

    # One-time setup: block-diag packed filter; zero the z borders (the
    # interior is fully rewritten per grid step, borders stay zero).
    @pl.when(i == 0)
    def _setup():
        up_ref[:, 0:64, 0:64] = u_ref[:].astype(wdt)
        up_ref[:, 64:128, 64:128] = u_ref[:].astype(wdt)
        up_ref[:, 0:64, 64:128] = jnp.zeros((16, 64, 64), wdt)
        up_ref[:, 64:128, 0:64] = jnp.zeros((16, 64, 64), wdt)
        for z in (z_even, z_odd):
            z[:] = jnp.zeros(z.shape, jnp.float32)

    # Stage: 4 strided-slice reads of x, written at the two lane halves.
    # Left halves take padded cols 2u+p (x cols 2u+p-1), right 2u+2+p.
    k2 = w // 2
    z_even[:, 1 : h + 1, 1:k2, 0:64] = x_ref[:, :, pl.Slice(1, k2 - 1, 2), :]
    z_even[:, 1 : h + 1, 0:k2, 64:128] = x_ref[:, :, pl.Slice(1, k2, 2), :]
    z_odd[:, 1 : h + 1, 0:k2, 0:64] = x_ref[:, :, pl.Slice(0, k2, 2), :]
    z_odd[:, 1 : h + 1, 0 : k2 - 1, 64:128] = x_ref[:, :, pl.Slice(2, k2 - 1, 2), :]

    rows = nb * tiles_h * npp
    d = [
        [
            (z_even if qj % 2 == 0 else z_odd)[
                :, pl.Slice(qi, tiles_h, 2), pl.Slice(qj // 2, npp, 2), :
            ].reshape(rows, 128)
            for qj in range(a)
        ]
        for qi in range(a)
    ]
    bt = np.asarray(transforms.matrices(2)[0], np.float64)
    v = _apply_separable(bt, d)
    mm = [
        [split_dot(v[pi][pj], up_ref[pi * a + pj], precision) for pj in range(a)]
        for pi in range(a)
    ]
    y = _apply_separable(np.asarray(transforms.matrices(2)[2], np.float64), mm)

    scale, bias = scale_ref[:], bias_ref[:]
    for oi in range(2):
        th_v = min(tiles_h, (h - 1 - oi) // 2 + 1)
        for oj in range(2):
            yy = y[oi][oj] * scale + bias
            if relu:
                yy = jnp.maximum(yy, 0.0)
            yy = yy.reshape(nb, tiles_h, npp, 128)
            tw_l = (w - 1 - oj) // 4 + 1       # left tiles: output col 4T+oj
            tw_r = (w - 3 - oj) // 4 + 1       # right tiles: col 4T+2+oj
            out_ref[:, pl.Slice(oi, th_v, 2), pl.Slice(oj, tw_l, 4), :] = (
                yy[:, :th_v, :tw_l, 0:64]
            )
            out_ref[:, pl.Slice(oi, th_v, 2), pl.Slice(oj + 2, tw_r, 4), :] = (
                yy[:, :th_v, :tw_r, 64:128]
            )


@functools.partial(
    jax.jit, static_argnames=("relu", "nb", "tiles_h", "npp", "interpret", "precision")
)
def _winograd_dense_p64(
    x, u, scale2d, bias2d, relu, nb, tiles_h, npp, interpret, precision
):
    n, h, w, _ = x.shape
    wdt = jnp.bfloat16 if precision == "bf16w" else jnp.float32
    kernel = functools.partial(
        _winograd_kernel_p64, nb=nb, tiles_h=tiles_h, npp=npp, h=h, w=w,
        relu=relu, precision=precision,
    )
    flops = n * (2 * 16 * (h // 2) * (w // 2) * 64 * 64 + 2 * (h // 2) * (w // 2) * 16 * (16 * 64 + 4 * 64))
    return pl.pallas_call(
        kernel,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, 64), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 64, 64), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, h, w, 64), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, 64), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb, h + 2, 2 * npp, 128), jnp.float32),
            pltpu.VMEM((nb, h + 2, 2 * npp, 128), jnp.float32),
            pltpu.VMEM((16, 128, 128), wdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n * h * w * 64 + 16 * 64 * 64),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, u.astype(wdt), scale2d, bias2d)


def _winograd_kernel(
    x_ref,       # (NB, H, W, Cin)    dense input, NB images per grid step
    u_ref,       # (a2, Cin, TILE_CO) transformed filter slice
    scale_ref,   # (1, TILE_CO)
    bias_ref,    # (1, TILE_CO)
    out_ref,     # (NB, H, W, TILE_CO)
    *scratch,    # G xpad buffers (NB, mTh+2, mTw'+2, CG) + optional v_ref
    m: int,
    nb: int,
    tiles_h: int,
    tiles_w: int,
    tw_pad: int,
    h: int,
    w: int,
    cin: int,
    cg: int,
    relu: bool,
    precision: str,
    has_vref: bool,
):
    n_groups = cin // cg
    xpads = scratch[:n_groups]
    v_ref = scratch[n_groups] if has_vref else None

    v_groups = winograd_stage_input(
        x_ref, xpads, v_ref, m=m, nb=nb, tiles_h=tiles_h, tw_pad=tw_pad,
        h=h, w=w, cg=cg,
    )

    # Phases 2+3 — per-position MXU tile GEMMs (the hot loop, contraction
    # split over channel groups) + separable At inverse; then the BN FMA
    # (+ReLU) epilogue and strided stores with static edge clipping.
    y = winograd_gemm_inverse(v_groups, u_ref, m=m, cg=cg, precision=precision)
    winograd_store_epilogue(
        y, out_ref, scale_ref[:], bias_ref[:], relu=relu, m=m, nb=nb,
        tiles_h=tiles_h, tiles_w=tiles_w, tw_pad=tw_pad, h=h, w=w,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "relu", "m", "nb", "tiles_h", "tiles_w", "tile_co", "interpret", "precision"
    ),
)
def _winograd_dense(
    x: jax.Array,       # (N, H, W, Cin) dense
    u: jax.Array,       # (a2, Cin, Cout)
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
    tw_pad = _pad_tiles_w(tiles_w)
    side_h, side_w = m * tiles_h, m * tw_pad
    n_j = cout // tile_co
    cg = 128 if cin % 128 == 0 else cin
    n_groups = cin // cg

    kernel = functools.partial(
        _winograd_kernel,
        m=m,
        nb=nb,
        tiles_h=tiles_h,
        tiles_w=tiles_w,
        tw_pad=tw_pad,
        h=h,
        w=w,
        cin=cin,
        cg=cg,
        relu=relu,
        precision=precision,
        has_vref=n_j > 1,
    )
    flops = n * (2 * a2 * nt * cin * cout + 2 * nt * a2 * (a2 * cin + m2 * cout))
    scratch_shapes = [
        pltpu.VMEM((nb, side_h + 2, side_w + 2, cg), jnp.float32)
        for _ in range(n_groups)
    ]
    if n_j > 1:
        scratch_shapes.append(
            pltpu.VMEM((a2, nb * tiles_h * tw_pad, cin), jnp.float32)
        )
    return pl.pallas_call(
        kernel,
        grid=(n // nb, n_j),
        in_specs=[
            pl.BlockSpec((nb, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a2, cin, tile_co), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, h, w, tile_co), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.float32),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (n * h * w * cin + a2 * cin * cout + n * h * w * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, u, scale2d, bias2d)


def _vmem_bytes(
    m: int,
    nb: int,
    tiles_h: int,
    tiles_w: int,
    h: int,
    w: int,
    cin: int,
    tile_co: int,
    n_j: int = 1,
) -> int:
    """Estimated kernel VMEM: padded staging + transform/GEMM values (the
    compiler materializes the a^2 V and M values) + double-buffered blocks
    + the V stash scratch used when output channels are tiled (n_j > 1)."""
    a2 = (m + 2) * (m + 2)
    nt = tiles_h * _pad_tiles_w(tiles_w)
    pad_hw = (m * tiles_h + 2) * (m * _pad_tiles_w(tiles_w) + 2)
    values = a2 * nb * nt * (cin + tile_co)
    blocks = 2 * (nb * h * w * (cin + tile_co) + a2 * cin * tile_co)
    stash = a2 * nb * nt * cin if n_j > 1 else 0
    return 4 * (nb * pad_hw * cin + values + blocks + stash)


def _vmem_bytes_p64(nb: int, h: int, w: int, npp: int) -> int:
    """Packed-64 kernel VMEM: two packed staging buffers + the a^2 V and M
    values (full 128-lane) + double-buffered in/out blocks + packed U."""
    rows = nb * (h // 2) * npp
    return 4 * (
        2 * nb * (h + 2) * 2 * npp * 128
        + 16 * rows * 128 * 2
        + 2 * nb * h * w * 128
        + 16 * 128 * 128
    )


@functools.partial(
    jax.jit,
    static_argnames=("relu", "nb", "tile_co", "interpret", "precision", "packed"),
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
    precision: str | None = None,
    packed: bool | None = None,
) -> jax.Array:
    """Fused 3x3 conv (pad 1, stride 1) + BN + ReLU via Winograd F(m,3).

    x: (H, W, Cin) or (N, H, W, Cin) float32;
    u: (a^2, Cin, Cout) offline-transformed filters
       (transforms.transform_filter — same on-disk layout as the reference's
       weight_winograd_*.bin, data_generator.py:63-78). The Winograd tile
       size m is inferred from a^2: 36 -> F(4x4,3x3), 16 -> F(2x2,3x3);
    scale, bias: (Cout,) offline-folded BN parameters.
    Returns the same spatial shape with Cout channels.

    precision: MXU policy for the tile GEMMs. Default (None) resolves per
    algebra: F(2,3) -> "bf16x3" (its +-1 transforms do not amplify
    magnitudes, measured ~2e-5 vs the f64 golden — inside the 1e-4 bar —
    at half the MXU passes of full f32); F(4,3) -> "highest" (its transform
    constants amplify bf16x3 rounding past the bar, measured ~3e-4).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    assert u.shape[1] == cin, (u.shape, cin)
    m = {36: 4, 16: 2}.get(u.shape[0])
    assert m is not None, f"filter leading dim {u.shape[0]} is not 36 (F(4,3)) or 16 (F(2,3))"
    if precision is None:
        precision = "bf16x3" if m == 2 else "highest"
    cout = u.shape[2]
    tiles_h, tiles_w = _cdiv(h, m), _cdiv(w, m)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Lane-packed tile-pair path for 64-channel F(2,3) convs (ResNet-18/34
    # conv2_x): two tile columns share one 128-lane tile, block-diag packed
    # filter — full lane width through transform, GEMM, and epilogue.
    if packed is None:
        packed = (
            m == 2 and cin == 64 and cout == 64
            and h % 2 == 0 and w % 4 == 0 and h * w >= 32 * 32
        )
    if packed:
        assert m == 2 and cin == 64 and cout == 64, (m, cin, cout)
        assert h % 2 == 0 and w % 4 == 0, (h, w)
        npp = _pad_tiles_w(w // 4)
        if nb is None:
            nb = 1
            while (
                nb * 2 <= n
                and n % (nb * 2) == 0
                and _vmem_bytes_p64(nb * 2, h, w, npp) <= 14 * 2**20
            ):
                nb *= 2
        assert n % nb == 0, (n, nb)
        sc2 = jnp.tile(scale.reshape(1, cout).astype(jnp.float32), (1, 2))
        bi2 = jnp.tile(bias.reshape(1, cout).astype(jnp.float32), (1, 2))
        out = _winograd_dense_p64(
            x.astype(jnp.float32), u, sc2, bi2, relu,
            nb, h // 2, npp, interpret, precision,
        )
        return out[0] if squeeze else out

    # Output-channel slicing: capped at one lane tile (128) — Mosaic's
    # strided stores need a single-tile minor dim on the output block — and
    # it also bounds the resident U slice (~2.4 MB at Cin=256, tile_co=128).
    a2 = u.shape[0]
    if tile_co is None:
        from winograd_tpu.kernels.pointwise import mxu_lane_divisor

        tile_co = mxu_lane_divisor(cout, 128)
    assert cout % tile_co == 0, (cout, tile_co)
    assert tile_co <= 128, f"tile_co must be <= one lane tile, got {tile_co}"

    # Images per grid step: grow the tile-GEMM row block, bounded only by
    # the VMEM budget. Measured at N=8: rows well past the MXU's 128 keep
    # paying (128ch nb=8 / 448 rows: 5.7 -> 3.85 us; 256ch nb=4 / 224 rows:
    # 27 -> 23.7 us) — more rows amortize the per-position weight loads,
    # and the VMEM estimate stops before the configs that blow the budget.
    nt = tiles_h * tiles_w
    n_j = cout // tile_co
    if nb is None:
        nb = 1
        while (
            nb * 2 <= n
            and n % (nb * 2) == 0
            and _vmem_bytes(m, nb * 2, tiles_h, tiles_w, h, w, cin, tile_co, n_j)
            <= 20 * 2**20
        ):
            nb *= 2
    assert n % nb == 0, (n, nb)

    out = _winograd_dense(
        x.astype(jnp.float32),
        u.astype(jnp.bfloat16 if precision == "bf16w" else jnp.float32),
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

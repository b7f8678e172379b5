"""Int8 quantized fused conv kernels — the low-precision serving tier.

The reference is f32-only. On TPU the MXU runs int8 x int8 -> int32 at
twice the bf16 rate, so a quantized tier is the natural serving option for
throughput-bound deployments. Scheme (standard, simple, symmetric):

* Weights: OFFLINE symmetric per-output-channel quantization
  (quantize_weights): w_q = round(w / s_w[col]), s_w = max|w[:, col]| / 127.
* Activations: dynamic symmetric quantization IN-KERNEL, per ROW by
  default (each pixel gets its own scale — one VPU lane-reduction, a
  measurably tighter bound than per-tensor at no MXU cost; per_row=False
  gives the round-1 per-tensor behavior).
* GEMM: int8 x int8 -> int32 on the MXU, dequantized by s_x[row] *
  s_w[col], then the usual folded-BN FMA (+ReLU) epilogue in f32.

Accuracy tier: ~1e-2 relative (8-bit), NOT the f32 1e-4 parity bar — the
tests check a quantization-appropriate bound instead. Use for serving where
throughput matters more than the last two digits. Beyond the block
megakernel this module also provides the int8 weight-streaming STAGE
kernel (resnet_stage_int8_pallas): conv5_x-class blocks are HBM-bound on
f32 weights (17.8 MB/block); int8 storage cuts the streamed bytes 4x.
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


def _qdot(x, wq_ref, sw_row, per_row: bool = True):
    """Dynamic activation quant + int8 MXU GEMM + dequant.

    per_row=True gives every row (pixel) its own symmetric scale — one
    lane-reduction on the VPU — which keeps quantization error from being
    set by the single largest activation in the tensor."""
    if per_row:
        s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0  # (P, 1)
    else:
        s_x = jnp.max(jnp.abs(x)) / 127.0
    s_x = jnp.where(s_x == 0, 1.0, s_x)
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s_x * sw_row)


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
    y = _qdot(x_ref[:], wq_ref, sw_ref[:])
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
    # Row tiling: the per-row activation quant is row-local, so a row grid
    # is exact. Small row counts run as ONE equal-to-dim block (no pad, no
    # slice — the mode-2/3 no-pad finding); large ones (the N=32 serving
    # modes put 100k+ rows through the conv2_x reduce) tile so the f32
    # staging + output stay a few MB of VMEM instead of OOMing the 16 MB
    # scoped limit (first seen at mode 27: 58.3 MB requested).
    if p <= 1024:
        tp = p
    else:
        tp = max(8, min(4096, (2 << 20) // max(cin + cout, 1) // 8 * 8))
        tp = min(tp, -(-p // 8) * 8)  # never exceed the (8-padded) row count
    p_pad = -(-p // tp) * tp
    if p_pad != p:
        x2d = jnp.pad(x2d, ((0, p_pad - p), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_quant_matmul_kernel, relu=relu),
        grid=(p_pad // tp,),
        in_specs=[
            pl.BlockSpec((tp, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tp, cout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
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


# --- int8 direct 3x3 kernel ---------------------------------------------------


def _direct_int8_kernel(
    x_ref,      # (1, H, W, Cin) f32
    w9q_ref,    # (9*Cin, TILE_CO) int8
    w9s_ref,    # (1, TILE_CO) weight scales
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
):
    from winograd_tpu.kernels.stage import _im2col_same3x3

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _im2col():
        def col_write(t, patch):
            col_ref[:, t * cin : (t + 1) * cin] = patch

        _im2col_same3x3(xpad_ref, x_ref[0], col_write, h=h, w=w, cmid=cin)

    y = _qdot(col_ref[:], w9q_ref, w9s_ref[:])
    tile_co = out_ref.shape[-1]
    y = y * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(h, w, tile_co)


def _direct_int8_banded_kernel(
    x_ref,      # (1, H, W, Cin) f32 — FULL image (the halo source)
    w9q_ref,    # (9*Cin, TILE_CO) int8
    w9s_ref,    # (1, TILE_CO) weight scales
    scale_ref,  # (1, TILE_CO)
    bias_ref,   # (1, TILE_CO)
    out_ref,    # (1, BH, W, TILE_CO) — one row band
    xpad_ref,   # scratch (BH+2, W+2, Cin)
    col_ref,    # scratch (BH*W, 9*Cin)
    *,
    h: int,
    w: int,
    cin: int,
    bh: int,
    n_b: int,
    relu: bool,
):
    """Row-banded twin of _direct_int8_kernel for geometries whose
    whole-image im2col matrix does not fit scoped VMEM (first seen at the
    N=32 serving mode: 56x56x64 wants a 7.2 MB column matrix plus the
    quantization temporaries — 20 MB against the 16 MB limit). The grid
    gains a band axis; each step stages only (BH+2, W+2) rows, reading its
    one-row halos from the full-image block (zeros at the global border,
    so the banded math is EXACT, not an approximation)."""
    b = pl.program_id(1)
    j = pl.program_id(2)
    row0 = b * bh

    @pl.when(j == 0)
    def _stage_band():
        # Interior rows + W borders.
        xpad_ref[1 : bh + 1, 1 : w + 1, :] = x_ref[0, pl.ds(row0, bh), :, :]
        xpad_ref[:, 0:1, :] = jnp.zeros((bh + 2, 1, cin), jnp.float32)
        xpad_ref[:, w + 1 :, :] = jnp.zeros((bh + 2, 1, cin), jnp.float32)
        # Halo rows: clamp the source index so it is always in range, then
        # overwrite with zeros at the global top/bottom edge.
        tsrc = jnp.maximum(row0 - 1, 0)
        bsrc = jnp.minimum(row0 + bh, h - 1)
        top = x_ref[0, pl.ds(tsrc, 1), :, :]
        bot = x_ref[0, pl.ds(bsrc, 1), :, :]
        zero_row = jnp.zeros((1, w, cin), jnp.float32)
        xpad_ref[0:1, 1 : w + 1, :] = jnp.where(b == 0, zero_row, top)
        xpad_ref[bh + 1 :, 1 : w + 1, :] = jnp.where(
            b == n_b - 1, zero_row, bot
        )
        for r in range(3):
            for s in range(3):
                t = 3 * r + s
                col_ref[:, t * cin : (t + 1) * cin] = xpad_ref[
                    r : r + bh, s : s + w, :
                ].reshape(bh * w, cin)

    y = _qdot(col_ref[:], w9q_ref, w9s_ref[:])
    tile_co = out_ref.shape[-1]
    y = y * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(bh, w, tile_co)


def _direct_int8_band_h(h: int, w: int, cin: int, tile_co: int) -> int:
    """Largest divisor of H whose banded footprint fits scoped VMEM.

    Budget model (bytes, per grid step): the staged column matrix plus the
    in-kernel quantization temporaries (~2.5x the column bytes: the f32
    x/s quotient, the int8 copy, the int32 accumulator), the padded band,
    the double-buffered full-image input and band output. 12 MB budget
    against the 16 MB limit keeps every geometry measured whole-image in
    round 4/5 (28x28x128 direct: ~11.1 MB) on its measured path and tiles
    only what cannot fit (56x56x64: 22 MB whole -> 11.4 MB at BH=28)."""
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0), reverse=True):
        est = 4 * (
            (bh + 2) * (w + 2) * cin
            + (bh * w * 9 * cin * 5) // 2
            + 2 * h * w * cin
            + 2 * bh * w * tile_co
        )
        if est <= 12 * 2**20:
            return bh
    return 1


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_co", "band_h", "interpret")
)
def conv3x3_bn_int8_pallas(
    x: jax.Array,
    w9_q: jax.Array,
    s_w9: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    *,
    tile_co: int | None = None,
    band_h: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Int8 fused 3x3 conv (pad 1) + BN (+ReLU): direct im2col staging, one
    int8 MXU GEMM with per-row dynamic activation quant, f32 epilogue —
    the 8-bit twin of kernels/direct.py::conv3x3_bn_direct_pallas,
    completing the serving-tier matrix for the standalone 3x3 modes
    (the Winograd algebra is not quantized: the +/-1 transform amplifies
    the per-tile dynamic range, so int8 tiles lose ~1 bit; direct im2col
    keeps activations in their natural scale). w9_q/s_w9 from
    quantize_weights(direct_filter(w)). Geometries whose whole-image
    column matrix exceeds scoped VMEM (56x56x64 at any batch) run the
    exact row-banded grid (_direct_int8_banded_kernel); band_h overrides
    the automatic band choice (tests pin both paths with it)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    assert w9_q.shape[0] == 9 * cin, (w9_q.shape, cin)
    cout = w9_q.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_co is None:
        from winograd_tpu.kernels.pointwise import mxu_lane_divisor

        tile_co = cout if 9 * cin * cout <= 4 * 2**20 else mxu_lane_divisor(cout, 256)
    assert cout % tile_co == 0, (cout, tile_co)
    n_j = cout // tile_co
    bh = band_h if band_h is not None else _direct_int8_band_h(h, w, cin, tile_co)
    assert h % bh == 0, (h, bh)
    n_b = h // bh

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    if n_b == 1:
        kernel = functools.partial(
            _direct_int8_kernel, h=h, w=w, cin=cin, relu=relu
        )
        grid = (n, n_j)
        in_maps = [
            lambda i, j: (i, 0, 0, 0),
            lambda i, j: (0, j),
        ]
        out_spec = pl.BlockSpec(
            (1, h, w, tile_co), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((h + 2, w + 2, cin), jnp.float32),
            pltpu.VMEM((h * w, 9 * cin), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _direct_int8_banded_kernel,
            h=h, w=w, cin=cin, bh=bh, n_b=n_b, relu=relu,
        )
        grid = (n, n_b, n_j)
        in_maps = [
            lambda i, b, j: (i, 0, 0, 0),
            lambda i, b, j: (0, j),
        ]
        out_spec = pl.BlockSpec(
            (1, bh, w, tile_co),
            lambda i, b, j: (i, b, 0, j),
            memory_space=pltpu.VMEM,
        )
        scratch = [
            pltpu.VMEM((bh + 2, w + 2, cin), jnp.float32),
            pltpu.VMEM((bh * w, 9 * cin), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cin), in_maps[0], memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, tile_co), in_maps[1], memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), in_maps[1], memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), in_maps[1], memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), in_maps[1], memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=n * 2 * h * w * 9 * cin * cout,
            bytes_accessed=4 * n * h * w * (cin + cout) + 9 * cin * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        jnp.asarray(w9_q, jnp.int8),
        row(s_w9, cout),
        row(scale, cout),
        row(bias, cout),
    )
    return out[0] if squeeze else out


# --- int8 Winograd F(2,3) 3x3 kernel -----------------------------------------


def quantize_winograd_filter(u) -> tuple:
    """Per-POSITION per-output-channel symmetric int8 quantization of the
    offline-transformed Winograd filter u (a2, Cin, Cout): each of the a2
    position GEMMs gets its own column scales, which absorb the G
    transform's per-position range growth — the reason a single per-tensor
    scale loses ~1 bit on the Winograd algebra. Returns
    (u_q int8 (a2, Cin, Cout), s_u f32 (a2, Cout))."""
    u = np.asarray(u, np.float32)
    s_u = np.abs(u).max(axis=1) / 127.0  # (a2, Cout)
    s_u = np.where(s_u == 0, 1.0, s_u).astype(np.float32)
    u_q = np.clip(np.rint(u / s_u[:, None, :]), -127, 127).astype(np.int8)
    return u_q, s_u


def _winograd_int8_kernel(
    x_ref,       # (NB, H, W, Cin) f32 dense input
    uq_ref,      # (a2, Cin, TILE_CO) int8 transformed filter slice
    su_ref,      # (a2, TILE_CO) f32 per-position weight scales
    scale_ref,   # (1, TILE_CO)
    bias_ref,    # (1, TILE_CO)
    out_ref,     # (NB, H, W, TILE_CO)
    *scratch,
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
    has_vref: bool,
):
    from winograd_tpu.kernels.winograd import (
        _apply_separable,
        winograd_stage_input,
        winograd_store_epilogue,
    )
    from winograd_tpu.kernels import transforms

    a = m + 2
    n_groups = cin // cg
    xpads = scratch[:n_groups]

    if not has_vref:
        # Single output tile: transform in f32 (pure +-1 VPU adds for
        # F(2,3)), quantize V per row per position inside the GEMM — the
        # dynamic per-row scale absorbs the Bt transform's range growth.
        v_groups = winograd_stage_input(
            x_ref, xpads, None, m=m, nb=nb, tiles_h=tiles_h, tw_pad=tw_pad,
            h=h, w=w, cg=cg,
        )
        mm = []
        for pi in range(a):
            row = []
            for pj in range(a):
                p = pi * a + pj
                sw = su_ref[p : p + 1, :]
                acc = None
                for g in range(n_groups):
                    part = _qdot(
                        v_groups[g][pi][pj],
                        uq_ref[p, g * cg : (g + 1) * cg, :],
                        sw,
                    )
                    acc = part if acc is None else acc + part
                row.append(acc)
            mm.append(row)
    else:
        # Output-channel tiling revisits the same image block: stash V
        # QUANTIZED (int8 + per-(position,row) scales over the full Cin) at
        # j == 0 — later j steps reload 1/4 the bytes of the old f32 stash
        # AND skip the per-step requantization (the measured round-4 loss
        # at mode 1: f32 stash 4.30 us vs direct 3.40). The int32 partials
        # accumulate ACROSS channel groups before one dequant, since the
        # row scale is shared by every group.
        j = pl.program_id(1)
        vq_ref = scratch[n_groups]       # (a2, rows, Cin) int8
        sv_ref = scratch[n_groups + 1]   # (rows, a2) f32 row scales

        @pl.when(j == 0)
        def _stash():
            vv_groups = winograd_stage_input(
                x_ref, xpads, None, m=m, nb=nb, tiles_h=tiles_h,
                tw_pad=tw_pad, h=h, w=w, cg=cg, j=j,
            )
            for pi in range(a):
                for pj in range(a):
                    p = pi * a + pj
                    s = None
                    for vv in vv_groups:
                        gmax = jnp.max(
                            jnp.abs(vv[pi][pj]), axis=-1, keepdims=True
                        )
                        s = gmax if s is None else jnp.maximum(s, gmax)
                    s = jnp.where(s == 0, 1.0, s) / 127.0
                    sv_ref[:, p : p + 1] = s
                    for g, vv in enumerate(vv_groups):
                        vq_ref[p, :, g * cg : (g + 1) * cg] = jnp.clip(
                            jnp.round(vv[pi][pj] / s), -127, 127
                        ).astype(jnp.int8)

        mm = []
        for pi in range(a):
            row = []
            for pj in range(a):
                p = pi * a + pj
                acc = None
                for g in range(n_groups):
                    part = jax.lax.dot_general(
                        vq_ref[p, :, g * cg : (g + 1) * cg],
                        uq_ref[p, g * cg : (g + 1) * cg, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = part if acc is None else acc + part
                row.append(
                    acc.astype(jnp.float32)
                    * (sv_ref[:, p : p + 1] * su_ref[p : p + 1, :])
                )
            mm.append(row)

    # Phase 3 — separable At inverse + epilogue, all f32.
    at = np.asarray(transforms.matrices(m)[2], np.float64)
    y = _apply_separable(at, mm)
    winograd_store_epilogue(
        y, out_ref, scale_ref[:], bias_ref[:], relu=relu, m=m, nb=nb,
        tiles_h=tiles_h, tiles_w=tiles_w, tw_pad=tw_pad, h=h, w=w,
    )


@functools.partial(
    jax.jit, static_argnames=("relu", "nb", "tile_co", "interpret")
)
def conv3x3_bn_winograd_int8_pallas(
    x: jax.Array,
    u_q: jax.Array,
    s_u: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    *,
    nb: int | None = None,
    tile_co: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Int8 fused 3x3 conv + BN (+ReLU) via Winograd F(2,3) — the quantized
    twin of kernels/winograd.py::conv3x3_bn_winograd_pallas. Same phases;
    the per-position tile GEMMs run int8 x int8 -> int32 on the MXU with
    per-row dynamic activation scales and per-position offline weight
    scales (quantize_winograd_filter). Unlike the int8 direct-im2col kernel
    there is NO column-matrix staging — the transform is strided reads +
    +-1 adds — which is what makes int8 pay at the reference's standalone
    14x14 geometry (VERDICT r3 weak #4).

    x: (H, W, Cin) or (N, H, W, Cin) f32; u_q/s_u from
    quantize_winograd_filter(transform_filter(w, m=2))."""
    from winograd_tpu.kernels.winograd import _cdiv, _pad_tiles_w, _vmem_bytes

    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    a2 = u_q.shape[0]
    assert a2 == 16, f"int8 winograd is F(2,3)-only (a2=16), got a2={a2}"
    assert u_q.shape[1] == cin, (u_q.shape, cin)
    m = 2
    cout = u_q.shape[2]
    tiles_h, tiles_w = _cdiv(h, m), _cdiv(w, m)
    tw_pad = _pad_tiles_w(tiles_w)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_co is None:
        from winograd_tpu.kernels.pointwise import mxu_lane_divisor

        tile_co = mxu_lane_divisor(cout, 128)
    assert cout % tile_co == 0 and tile_co <= 128, (cout, tile_co)
    cg = 128 if cin % 128 == 0 else cin
    n_groups = cin // cg
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
    side_h, side_w = m * tiles_h, m * tw_pad

    kernel = functools.partial(
        _winograd_int8_kernel,
        m=m, nb=nb, tiles_h=tiles_h, tiles_w=tiles_w, tw_pad=tw_pad,
        h=h, w=w, cin=cin, cg=cg, relu=relu, has_vref=n_j > 1,
    )
    scratch_shapes = [
        pltpu.VMEM((nb, side_h + 2, side_w + 2, cg), jnp.float32)
        for _ in range(n_groups)
    ]
    if n_j > 1:
        # Quantized V stash: int8 rows + per-(position,row) f32 scales —
        # 1/4 the reload bytes of an f32 stash, quantized ONCE at j == 0.
        rows = nb * tiles_h * tw_pad
        scratch_shapes.append(pltpu.VMEM((a2, rows, cin), jnp.int8))
        scratch_shapes.append(pltpu.VMEM((rows, a2), jnp.float32))
    nt = tiles_h * tiles_w
    flops = n * (2 * a2 * nt * cin * cout + 2 * nt * a2 * (a2 * cin + m * m * cout))

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    out = pl.pallas_call(
        kernel,
        grid=(n // nb, n_j),
        in_specs=[
            pl.BlockSpec((nb, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a2, cin, tile_co), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((a2, tile_co), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
            bytes_accessed=4 * n * h * w * (cin + cout) + a2 * cin * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        jnp.asarray(u_q, jnp.int8),
        jnp.asarray(s_u, jnp.float32),
        row(scale, cout),
        row(bias, cout),
    )
    return out[0] if squeeze else out


# --- int8 bottleneck-block megakernel ---------------------------------------


def quantize_block_params(params: dict) -> dict:
    """Offline int8 quantization of a block's three weight matrices
    (models/resnet.py layout) — BN scale/bias stay f32.

    When the F(2,3) artifact (u2_mid) is present it is carried as BFLOAT16:
    the Winograd algebra is not int8-quantized (the +/-1 transforms amplify
    the per-tile dynamic range, losing ~1 bit), but on large maps (28x28+)
    a bf16-weight winograd2 mid layer is both faster AND more accurate than
    the int8 direct-im2col mid — the int8 stage kernel routes it there
    (mode 9's tier lever). The streamed mid bytes are 16/9*2 = 3.6x the
    int8 direct bytes but the mid is compute-, not weight-bound at 28x28."""
    out = {}
    for key in ("w_reduce", "w9_mid", "w_expand"):
        wq, sw = quantize_weights(np.asarray(params[key]))
        out[f"{key}_q"] = wq
        out[f"{key}_s"] = sw
    if "u2_mid" in params:
        out["u2_mid_bf16"] = np.asarray(
            jnp.asarray(params["u2_mid"], jnp.float32).astype(jnp.bfloat16)
        )
    for key in ("s_reduce", "b_reduce", "s_mid", "b_mid", "s_expand", "b_expand"):
        out[key] = np.asarray(params[key], np.float32)
    return out


def _block_int8_kernel(
    x_ref,
    wr_ref, wr_s_ref, s1_ref, b1_ref,
    w9_ref, w9_s_ref, s2_ref, b2_ref,
    we_ref, we_s_ref, s3_ref, b3_ref,
    out_ref,
    xpad_ref,
    col_ref,
    *,
    h: int,
    w: int,
    cio: int,
    cmid: int,
):
    from winograd_tpu.kernels.stage import _im2col_same3x3

    hw = h * w
    x2 = x_ref[0].reshape(hw, cio)
    h1 = jnp.maximum(_qdot(x2, wr_ref, wr_s_ref[:]) * s1_ref[:] + b1_ref[:], 0.0)

    def col_write(t, patch):
        col_ref[:, t * cmid : (t + 1) * cmid] = patch

    _im2col_same3x3(
        xpad_ref, h1.reshape(h, w, cmid), col_write, h=h, w=w, cmid=cmid
    )
    h2 = jnp.maximum(_qdot(col_ref[:], w9_ref, w9_s_ref[:]) * s2_ref[:] + b2_ref[:], 0.0)

    h3 = _qdot(h2, we_ref, we_s_ref[:]) * s3_ref[:] + b3_ref[:]
    out_ref[0] = jnp.maximum(h3 + x2, 0.0).reshape(h, w, cio)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bottleneck_block_int8_pallas(
    x: jax.Array,
    qparams: dict,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Int8 bottleneck megakernel: all three GEMMs int8 on the MXU,
    activations dynamically quantized in VMEM between layers; BN/ReLU/skip
    in f32. qparams from quantize_block_params. 8-bit accuracy tier."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cio = x.shape
    cmid = qparams["w_reduce_q"].shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    const = lambda i: (0, 0)
    kernel = functools.partial(_block_int8_kernel, h=h, w=w, cio=cio, cmid=cmid)
    specs = [pl.BlockSpec((1, h, w, cio), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)]
    args = [x.astype(jnp.float32)]
    for wkey, c_in, c_out in (
        ("w_reduce", cio, cmid),
        ("w9_mid", 9 * cmid, cmid),
        ("w_expand", cmid, cio),
    ):
        bn = {"w_reduce": ("s_reduce", "b_reduce"), "w9_mid": ("s_mid", "b_mid"),
              "w_expand": ("s_expand", "b_expand")}[wkey]
        specs += [
            pl.BlockSpec((c_in, c_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), const, memory_space=pltpu.VMEM),
        ]
        args += [
            jnp.asarray(qparams[f"{wkey}_q"], jnp.int8),
            row(qparams[f"{wkey}_s"], c_out),
            row(qparams[bn[0]], c_out),
            row(qparams[bn[1]], c_out),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, w, cio), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cio), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((h * w, 9 * cmid), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * (cio * cmid + 9 * cmid * cmid + cmid * cio),
            bytes_accessed=8 * n * h * w * cio + cio * cmid * 2 + 9 * cmid * cmid,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[0] if squeeze else out


# --- int8 weight-streaming stage kernel --------------------------------------


def quantize_stage_params(params_list) -> dict:
    """Offline int8 quantization of a whole stage, stacked on a leading
    block axis (the int8 twin of kernels/stage.py:stack_stage_params)."""
    qs = [quantize_block_params(p) for p in params_list]
    out = {}
    for key in qs[0]:
        arrs = [np.asarray(q[key]) for q in qs]
        if arrs[0].ndim == 1:
            arrs = [a.reshape(1, -1) for a in arrs]
        out[key] = jnp.asarray(np.stack(arrs))
    return out


def _stage_int8_kernel(
    x_ref,     # (1, H, W, Cio) f32
    wr_ref, wr_s_ref, s1_ref, b1_ref,   # block b's int8 weights + scales
    w9_ref, w9_s_ref, s2_ref, b2_ref,   # direct int8 OR (1,16,Cmid,Cmid) bf16
    we_ref, we_s_ref, s3_ref, b3_ref,
    out_ref,   # (1, H, W, Cio)
    act_ref,   # scratch (H*W, Cio) persists across blocks
    *mid_scratch,  # direct: xpad + col; winograd2: G xpads + G h2 buffers
    h: int,
    w: int,
    cio: int,
    cmid: int,
    n_blocks: int,
    mid_algo: str,
):
    hw = h * w
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _load_input():
        act_ref[:] = x_ref[0].reshape(hw, cio)

    y = _stage_int8_block_body(
        act_ref[:], wr_ref, wr_s_ref, s1_ref, b1_ref,
        w9_ref, w9_s_ref, s2_ref, b2_ref, we_ref, we_s_ref, s3_ref, b3_ref,
        mid_scratch, h=h, w=w, cmid=cmid, mid_algo=mid_algo,
    )
    act_ref[:] = y

    @pl.when(b == n_blocks - 1)
    def _store_output():
        out_ref[0] = y.reshape(h, w, cio)


def _stage_int8_block_body(x2, wr_ref, wr_s_ref, s1_ref, b1_ref,
                           w9_ref, w9_s_ref, s2_ref, b2_ref,
                           we_ref, we_s_ref, s3_ref, b3_ref,
                           mid_scratch, *, h, w, cmid, mid_algo="direct"):
    """One int8 bottleneck block on one image's rows (shared by the
    image-outer streaming kernel and the weight-resident batched one).

    mid_algo "winograd2" runs the 3x3 as in-kernel F(2,3) Winograd with a
    BFLOAT16 filter (w9_ref is then the (1, 16, Cmid, Cmid) u2 artifact and
    w9_s_ref is unused): on 28x28-class maps this is both faster and more
    accurate than the int8 direct-im2col mid — the winograd algebra's +/-1
    transforms make int8 tiles lose ~1 bit, but they are exact in bf16w
    (kernels/direct.py::split_dot)."""
    from winograd_tpu.kernels.stage import _im2col_same3x3

    hw = h * w
    h1 = jnp.maximum(_qdot(x2, wr_ref[0], wr_s_ref[0]) * s1_ref[0] + b1_ref[0], 0.0)

    if mid_algo == "winograd2":
        from winograd_tpu.kernels.block import winograd_mid_layer

        cg = mid_scratch[0].shape[-1]
        n_groups = cmid // cg
        xpads, h2gs = mid_scratch[:n_groups], mid_scratch[n_groups:]
        tw_pad = (xpads[0].shape[1] - 2) // 2
        h2gs = winograd_mid_layer(
            h1, w9_ref[0], s2_ref[0], b2_ref[0], xpads, h2gs,
            h=h, w=w, cmid=cmid, tw_pad=tw_pad, precision="bf16w",
        )
        h3 = None
        for g, h2g in enumerate(h2gs):
            part = _qdot(
                h2g[:].reshape(hw, cg),
                we_ref[0, g * cg : (g + 1) * cg, :],
                we_s_ref[0],
            )
            h3 = part if h3 is None else h3 + part
        h3 = h3 * s3_ref[0] + b3_ref[0]
    else:
        xpad_ref, col_ref = mid_scratch

        def col_write(t, patch):
            col_ref[:, t * cmid : (t + 1) * cmid] = patch

        _im2col_same3x3(
            xpad_ref, h1.reshape(h, w, cmid), col_write, h=h, w=w, cmid=cmid
        )
        h2 = jnp.maximum(
            _qdot(col_ref[:], w9_ref[0], w9_s_ref[0]) * s2_ref[0] + b2_ref[0], 0.0
        )
        h3 = _qdot(h2, we_ref[0], we_s_ref[0]) * s3_ref[0] + b3_ref[0]
    return jnp.maximum(h3 + x2, 0.0)


def _stage_int8_kernel_resident(
    x_hbm,     # (N, HWp, Cio) f32 in ANY (HBM)
    wr_ref, wr_s_ref, s1_ref, b1_ref,
    w9_ref, w9_s_ref, s2_ref, b2_ref,
    we_ref, we_s_ref, s3_ref, b3_ref,
    out_hbm,   # (N, HWp, Cio) in ANY (HBM)
    act_ref,   # scratch (N, HWp, Cio) — every image's activation, resident
    sem,       # DMA semaphores (2,)
    xpad_ref,  # scratch (H+2, W+2, Cmid) per-image im2col staging
    col_ref,   # scratch (N, HWp, 9*Cmid) ALL images' im2col rows
    *,
    h: int,
    w: int,
    cio: int,
    cmid: int,
    n_blocks: int,
    n: int,
):
    """Block-OUTER row-batched int8 stage (kernels/stage.py resident
    layout): grid (n_blocks,); each block's int8 weights are fetched once
    for the whole batch, and the int8 GEMMs contract all images' rows at
    once. Rows padded to roundup(H*W, 8) (kernels/stage.py::_pad_rows);
    pad rows are zeros, so their dynamic activation scale clamps to 1 and
    they stay finite through every block."""
    hw = h * w
    hw_pad = act_ref.shape[1]
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _load_images():
        for i in range(n):
            cp = pltpu.make_async_copy(x_hbm.at[i], act_ref.at[i], sem.at[0])
            cp.start()
            cp.wait()
        if hw_pad != hw:
            for i in range(n):
                col_ref[i, hw:, :] = jnp.zeros(
                    (hw_pad - hw, col_ref.shape[-1]), jnp.float32
                )

    allact = act_ref[:].reshape(n * hw_pad, cio)
    h1all = jnp.maximum(
        _qdot(allact, wr_ref[0], wr_s_ref[0]) * s1_ref[0] + b1_ref[0], 0.0
    )
    from winograd_tpu.kernels.stage import _im2col_same3x3

    for i in range(n):
        h1 = h1all[i * hw_pad : i * hw_pad + hw].reshape(h, w, cmid)

        def col_write(t, patch, i=i):
            col_ref[i, :hw, t * cmid : (t + 1) * cmid] = patch

        _im2col_same3x3(xpad_ref, h1, col_write, h=h, w=w, cmid=cmid)
    h2all = jnp.maximum(
        _qdot(col_ref[:].reshape(n * hw_pad, 9 * cmid), w9_ref[0], w9_s_ref[0])
        * s2_ref[0]
        + b2_ref[0],
        0.0,
    )
    h3all = _qdot(h2all, we_ref[0], we_s_ref[0]) * s3_ref[0] + b3_ref[0]
    yall = jnp.maximum(h3all + allact, 0.0)
    act_ref[:] = yall.reshape(act_ref.shape)

    @pl.when(b == n_blocks - 1)
    def _store_images():
        for i in range(n):
            cp = pltpu.make_async_copy(act_ref.at[i], out_hbm.at[i], sem.at[1])
            cp.start()
            cp.wait()


# --- int8 stride-2 transition kernel ------------------------------------------


def quantize_transition_params(params: dict) -> dict:
    """Offline int8 quantization of a transition block's four weight
    matrices (models/downsample.py layout) — BN scale/bias stay f32."""
    out = {}
    for key in ("w_reduce", "w9_mid", "w_expand", "w_proj"):
        wq, sw = quantize_weights(np.asarray(params[key]))
        out[f"{key}_q"] = jnp.asarray(wq)
        out[f"{key}_s"] = jnp.asarray(sw)
    for key in ("s_reduce", "b_reduce", "s_mid", "b_mid",
                "s_expand", "b_expand", "s_proj", "b_proj"):
        out[key] = jnp.asarray(params[key], jnp.float32)
    return out


def _transition_int8_kernel(
    x_ref,     # (1, H, W, Cin)
    wr_ref, wr_s_ref, s1_ref, b1_ref,
    w9_ref, w9_s_ref, s2_ref, b2_ref,
    we_ref, we_s_ref, s3_ref, b3_ref,   # streamed over j
    wp_ref, wp_s_ref, sp_ref, bp_ref,   # streamed over j
    out_ref,   # (1, HO, WO, TILE_CO)
    h2_ref,    # scratch (HO*WO, Cmid)
    xs_ref,    # scratch (HO*WO, Cin)
    col_ref,   # scratch (HO*WO, 9*Cmid)
    *xpads,    # mid staging groups then input staging groups
    h: int,
    w: int,
    cin: int,
    cmid: int,
    n_mid_groups: int,
):
    ho, wo = -(-h // 2), -(-w // 2)
    hwo = ho * wo
    j = pl.program_id(1)
    mids = xpads[:n_mid_groups]
    ins = xpads[n_mid_groups:]
    cgm = mids[0].shape[-1]
    cgi = ins[0].shape[-1]

    @pl.when(j == 0)
    def _front():
        x2 = x_ref[0].reshape(h * w, cin)
        h1 = jnp.maximum(
            _qdot(x2, wr_ref, wr_s_ref[:]) * s1_ref[:] + b1_ref[:], 0.0
        ).reshape(h, w, cmid)
        for g, xp in enumerate(mids):
            gsl = slice(g * cgm, (g + 1) * cgm)
            ph, pw = xp.shape[0], xp.shape[1]
            xp[0:1, :, :] = jnp.zeros((1, pw, cgm), jnp.float32)
            xp[h + 1 :, :, :] = jnp.zeros((ph - h - 1, pw, cgm), jnp.float32)
            xp[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cgm), jnp.float32)
            xp[1 : h + 1, w + 1 :, :] = jnp.zeros((h, pw - w - 1, cgm), jnp.float32)
            xp[1 : h + 1, 1 : w + 1, :] = h1[:, :, gsl]
            for r in range(3):
                for s in range(3):
                    patch = xp[
                        pl.Slice(r, ho, 2), pl.Slice(s, wo, 2), :
                    ].reshape(hwo, cgm)
                    base = (3 * r + s) * cmid + g * cgm
                    col_ref[:, base : base + cgm] = patch
        h2_ref[:] = jnp.maximum(
            _qdot(col_ref[:], w9_ref, w9_s_ref[:]) * s2_ref[:] + b2_ref[:], 0.0
        )
        for g, xg in enumerate(ins):
            gsl = slice(g * cgi, (g + 1) * cgi)
            xg[:, :, :] = x_ref[0, :, :, gsl]
            xs_ref[:, gsl] = xg[
                pl.Slice(0, ho, 2), pl.Slice(0, wo, 2), :
            ].reshape(hwo, cgi)

    h3 = _qdot(h2_ref[:], we_ref, we_s_ref[:]) * s3_ref[:] + b3_ref[:]
    skip = _qdot(xs_ref[:], wp_ref, wp_s_ref[:]) * sp_ref[:] + bp_ref[:]
    tile_co = out_ref.shape[-1]
    out_ref[0] = jnp.maximum(h3 + skip, 0.0).reshape(ho, wo, tile_co)


def _transition_int8_kernel_resident(
    x_hbm,     # (N, H, W, Cin) f32 in ANY (HBM) — manually DMA'd at j == 0
    wr_ref, wr_s_ref, s1_ref, b1_ref,
    w9_ref, w9_s_ref, s2_ref, b2_ref,
    we_ref, we_s_ref, s3_ref, b3_ref,   # streamed over OUTER j — once/batch
    wp_ref, wp_s_ref, sp_ref, bp_ref,   # streamed over OUTER j
    out_ref,   # (N, HO, WO, TILE_CO)
    xin_ref,   # scratch (HWp, Cin)        DMA landing buffer (padded rows)
    h2_ref,    # scratch (N, HWOp, Cmid)   every image's mid output
    xs_ref,    # scratch (N, HWOp, Cin)    every image's subsampled skip
    col_ref,   # scratch (HO*WO, 9*Cmid)
    sem,       # DMA semaphore
    *xpads,
    h: int,
    w: int,
    cin: int,
    cmid: int,
    n_mid_groups: int,
    n: int,
):
    """Tile-OUTER row-batched int8 transition (kernels/transition.py
    resident layout): grid (n_j,); each expand/projection int8 tile streams
    once for the whole batch and its GEMMs contract all images' rows at
    once. Rows padded to HWOp = roundup(HO*WO, 8)."""
    ho, wo = -(-h // 2), -(-w // 2)
    hwo = ho * wo
    hwo_pad = h2_ref.shape[1]
    j = pl.program_id(0)
    mids = xpads[:n_mid_groups]
    ins = xpads[n_mid_groups:]
    cgm = mids[0].shape[-1]
    cgi = ins[0].shape[-1]

    def pad_rows(v):
        if hwo_pad == hwo:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((hwo_pad - hwo, v.shape[1]), jnp.float32)]
        )

    @pl.when(j == 0)
    def _front():
        for i in range(n):
            cp = pltpu.make_async_copy(x_hbm.at[i], xin_ref, sem)
            cp.start()
            cp.wait()
            x2 = xin_ref[:][: h * w]
            h1 = jnp.maximum(
                _qdot(x2, wr_ref, wr_s_ref[:]) * s1_ref[:] + b1_ref[:], 0.0
            ).reshape(h, w, cmid)
            for g, xp in enumerate(mids):
                gsl = slice(g * cgm, (g + 1) * cgm)
                ph, pw = xp.shape[0], xp.shape[1]
                xp[0:1, :, :] = jnp.zeros((1, pw, cgm), jnp.float32)
                xp[h + 1 :, :, :] = jnp.zeros((ph - h - 1, pw, cgm), jnp.float32)
                xp[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cgm), jnp.float32)
                xp[1 : h + 1, w + 1 :, :] = jnp.zeros(
                    (h, pw - w - 1, cgm), jnp.float32
                )
                xp[1 : h + 1, 1 : w + 1, :] = h1[:, :, gsl]
                for r in range(3):
                    for s in range(3):
                        patch = xp[
                            pl.Slice(r, ho, 2), pl.Slice(s, wo, 2), :
                        ].reshape(hwo, cgm)
                        base = (3 * r + s) * cmid + g * cgm
                        col_ref[:, base : base + cgm] = patch
            h2_ref[i] = pad_rows(
                jnp.maximum(
                    _qdot(col_ref[:], w9_ref, w9_s_ref[:]) * s2_ref[:]
                    + b2_ref[:],
                    0.0,
                )
            )
            for g, xg in enumerate(ins):
                gsl = slice(g * cgi, (g + 1) * cgi)
                xg[:, :, :] = x2[:, gsl].reshape(h, w, cgi)
                xs_ref[i, :, gsl] = pad_rows(
                    xg[pl.Slice(0, ho, 2), pl.Slice(0, wo, 2), :].reshape(hwo, cgi)
                )

    h2all = h2_ref[:].reshape(n * hwo_pad, cmid)
    xsall = xs_ref[:].reshape(n * hwo_pad, cin)
    h3 = _qdot(h2all, we_ref, we_s_ref[:]) * s3_ref[:] + b3_ref[:]
    skip = _qdot(xsall, wp_ref, wp_s_ref[:]) * sp_ref[:] + bp_ref[:]
    tile_co = out_ref.shape[-1]
    y = jnp.maximum(h3 + skip, 0.0).reshape(n, hwo_pad, tile_co)
    out_ref[:] = y[:, :hwo, :].reshape(n, ho, wo, tile_co)


@functools.partial(
    jax.jit, static_argnames=("tile_co", "interpret", "resident")
)
def transition_block_int8_pallas(
    x: jax.Array,
    qparams: dict,
    *,
    tile_co: int | None = None,
    interpret: bool | None = None,
    resident: bool | None = None,
) -> jax.Array:
    """Int8 fused stride-2 transition block (kernels/transition.py structure,
    int8 MXU GEMMs with per-row dynamic activation quant). Completes the
    int8 serving tier: with resnet_stage_int8_pallas this serves the whole
    multi-stage backbone at the 8-bit bound with 4x fewer weight bytes.
    qparams from quantize_transition_params."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    cmid = qparams["w_reduce_q"].shape[1]
    cout = qparams["w_expand_q"].shape[1]
    ho, wo = -(-h // 2), -(-w // 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_co is None:
        from winograd_tpu.kernels.pointwise import mxu_lane_divisor

        tile_co = (
            cout
            if (cmid + cin) * cout <= 4 * 2**20  # int8: 1 B/elem
            else mxu_lane_divisor(cout, 256)
        )
    assert cout % tile_co == 0, (cout, tile_co)
    n_j = cout // tile_co

    cgm = 128 if cmid % 128 == 0 else cmid
    cgi = 128 if cin % 128 == 0 else cin
    n_mid = cmid // cgm
    ph, pw = 2 * ho + 2, 2 * wo + 2

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    # Batched inputs take the tile-outer weight-resident layout (see the
    # f32 twin in kernels/transition.py); at n_j == 1 the image-outer
    # layout already fetches the weights once per batch, and its pipelined
    # x blocks beat the resident path's blocking per-image DMA.
    if resident is None:
        # Default OFF — same end-to-end finding as the f32 twin
        # (kernels/transition.py): explicit opt-in only.
        resident = False
    resident = resident and n > 1 and n_j > 1
    if resident:
        from winograd_tpu.kernels.stage import _pad_rows

        hw_pad = _pad_rows(h * w)
        hwo_pad = _pad_rows(ho * wo)
        kernel = functools.partial(
            _transition_int8_kernel_resident,
            h=h, w=w, cin=cin, cmid=cmid, n_mid_groups=n_mid, n=n,
        )
        res = lambda j: (0, 0)
        stream = lambda j: (0, j)
        out_idx = lambda j: (0, 0, 0, j)
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        grid = (n_j,)
        # Rows layout, padded to the sublane tile (kernels/transition.py).
        x_arg = x.astype(jnp.float32).reshape(n, h * w, cin)
        if hw_pad != h * w:
            x_arg = jnp.pad(x_arg, ((0, 0), (0, hw_pad - h * w), (0, 0)))
    else:
        kernel = functools.partial(
            _transition_int8_kernel,
            h=h, w=w, cin=cin, cmid=cmid, n_mid_groups=n_mid,
        )
        res = lambda i, j: (0, 0)
        stream = lambda i, j: (0, j)
        out_idx = lambda i, j: (i, 0, 0, j)
        x_spec = pl.BlockSpec(
            (1, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        grid = (n, n_j)
        x_arg = x.astype(jnp.float32)
    flops = 2 * n * (
        h * w * cin * cmid
        + ho * wo * (9 * cmid * cmid + cmid * cout + cin * cout)
    )
    specs = [
        x_spec,
        pl.BlockSpec((cin, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * cmid, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
        pl.BlockSpec((cmid, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
    ]
    if resident:
        scratch_shapes = [
            pltpu.VMEM((hw_pad, cin), jnp.float32),  # DMA landing buffer
            pltpu.VMEM((n, hwo_pad, cmid), jnp.float32),
            pltpu.VMEM((n, hwo_pad, cin), jnp.float32),
            pltpu.VMEM((ho * wo, 9 * cmid), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((ho * wo, cmid), jnp.float32),
            pltpu.VMEM((ho * wo, cin), jnp.float32),
            pltpu.VMEM((ho * wo, 9 * cmid), jnp.float32),
        ]
    scratch_shapes = (
        scratch_shapes
        + [pltpu.VMEM((ph, pw, cgm), jnp.float32) for _ in range(n_mid)]
        + [pltpu.VMEM((h, w, cgi), jnp.float32) for _ in range(cin // cgi)]
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec(
            ((n if resident else 1), ho, wo, tile_co),
            out_idx,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), jnp.float32),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * n * (h * w * cin + ho * wo * cout)
            + (1 if resident else n)
            * (cin * cmid + 9 * cmid * cmid + (cmid + cin) * cout),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(24 + (4 * n if resident else 0)) * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x_arg,
        qparams["w_reduce_q"], row(qparams["w_reduce_s"], cmid),
        row(qparams["s_reduce"], cmid), row(qparams["b_reduce"], cmid),
        qparams["w9_mid_q"], row(qparams["w9_mid_s"], cmid),
        row(qparams["s_mid"], cmid), row(qparams["b_mid"], cmid),
        qparams["w_expand_q"], row(qparams["w_expand_s"], cout),
        row(qparams["s_expand"], cout), row(qparams["b_expand"], cout),
        qparams["w_proj_q"], row(qparams["w_proj_s"], cout),
        row(qparams["s_proj"], cout), row(qparams["b_proj"], cout),
    )
    return out[0] if squeeze else out


@functools.partial(
    jax.jit, static_argnames=("interpret", "resident", "mid_algo")
)
def resnet_stage_int8_pallas(
    x: jax.Array,
    qstacked: dict,
    *,
    interpret: bool | None = None,
    resident: bool | None = None,
    mid_algo: str = "auto",
) -> jax.Array:
    """A whole stage of int8 bottleneck blocks in ONE Pallas kernel with
    weight streaming (kernels/stage.py structure): the activation persists
    in VMEM scratch across blocks while each block's INT8 weights stream
    from HBM at a quarter of the f32 bytes — the serving tier for
    HBM-bound geometries like ResNet-50 conv5_x (17.8 MB/block in f32).

    mid_algo "auto" mirrors the f32 stage kernel's routing: on large maps
    (28x28+) the 3x3 runs in-kernel F(2,3) Winograd with the BFLOAT16 u2
    artifact (the 1x1s stay int8) — at that geometry the winograd2 mid is
    both faster and MORE accurate than int8 direct im2col, which is why
    the tier mixes precisions there rather than quantizing the Winograd
    algebra (see quantize_block_params).

    x: (H, W, Cio) or (N, H, W, Cio); qstacked from quantize_stage_params
    (works for n_blocks == 1 too: a single streamed int8 block)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cio = x.shape
    n_blocks, _, cmid = qstacked["w_reduce_q"].shape
    if mid_algo == "auto":
        mid_algo = (
            "winograd2"
            if "u2_mid_bf16" in qstacked and h * w >= 28 * 28
            else "direct"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Batched inputs take the block-outer weight-resident layout
    # (kernels/stage.py design): each block's int8 weights are fetched once
    # for the whole batch instead of once per image. At n_blocks == 1 the
    # image-outer layout's constant weight index already fetches once.
    if resident is None:
        # Default OFF — same end-to-end finding as the f32 twin
        # (kernels/stage.py): explicit opt-in only.
        resident = False
    resident = resident and n > 1 and mid_algo == "direct"
    if resident:
        kernel = functools.partial(
            _stage_int8_kernel_resident,
            h=h, w=w, cio=cio, cmid=cmid, n_blocks=n_blocks, n=n,
        )
        blk = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
    else:
        kernel = functools.partial(
            _stage_int8_kernel,
            h=h, w=w, cio=cio, cmid=cmid, n_blocks=n_blocks, mid_algo=mid_algo,
        )
        blk = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda i, b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
    img = lambda i, b: (i, 0, 0, 0)
    flops = 2 * n * n_blocks * h * w * (cio * cmid + 9 * cmid * cmid + cmid * cio)
    if mid_algo == "winograd2":
        from winograd_tpu.kernels.winograd import _pad_tiles_w

        cg = 128 if cmid % 128 == 0 else cmid
        th, tw = -(-h // 2), -(-w // 2)
        tw_pad = _pad_tiles_w(tw)
        mid_spec = blk((16, cmid, cmid))
        mid_arg = qstacked["u2_mid_bf16"]
        mid_s_arg = qstacked["w9_mid_s"]  # unused by the winograd2 route
        mid_scratch = [
            pltpu.VMEM((2 * th + 2, 2 * tw_pad + 2, cg), jnp.float32)
            for _ in range(cmid // cg)
        ] + [pltpu.VMEM((h, w, cg), jnp.float32) for _ in range(cmid // cg)]
        mid_wbytes = 2 * 16 * cmid * cmid  # bf16 u2 artifact
    else:
        mid_spec = blk((9 * cmid, cmid))
        mid_arg = qstacked["w9_mid_q"]
        mid_s_arg = qstacked["w9_mid_s"]
        mid_scratch = [
            pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((h * w, 9 * cmid), jnp.float32),
        ]
        mid_wbytes = 9 * cmid * cmid  # int8: 1 B each
    wbytes = n_blocks * (2 * cio * cmid + mid_wbytes)
    weight_specs = [
        blk((cio, cmid)), blk((1, cmid)), blk((1, cmid)), blk((1, cmid)),
        mid_spec, blk((1, cmid)), blk((1, cmid)), blk((1, cmid)),
        blk((cmid, cio)), blk((1, cio)), blk((1, cio)), blk((1, cio)),
    ]
    weight_args = (
        qstacked["w_reduce_q"], qstacked["w_reduce_s"],
        qstacked["s_reduce"], qstacked["b_reduce"],
        mid_arg, mid_s_arg,
        qstacked["s_mid"], qstacked["b_mid"],
        qstacked["w_expand_q"], qstacked["w_expand_s"],
        qstacked["s_expand"], qstacked["b_expand"],
    )
    if resident:
        from winograd_tpu.kernels.stage import _pad_rows

        hw_pad = _pad_rows(h * w)
        x_rows = x.astype(jnp.float32).reshape(n, h * w, cio)
        if hw_pad != h * w:
            x_rows = jnp.pad(x_rows, ((0, 0), (0, hw_pad - h * w), (0, 0)))
        vmem_limit = max(
            24 * 1024 * 1024,
            int(
                1.5
                * (
                    2 * 2 * (2 * cio * cmid + 9 * cmid * cmid)  # int8+scales
                    + 4 * n * hw_pad * (cio + 9 * cmid)
                    + 4 * (h + 2) * (w + 2) * cmid
                )
            ),
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + weight_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n, hw_pad, cio), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n, hw_pad, cio), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
                pltpu.VMEM((n, hw_pad, 9 * cmid), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * 2 * n * h * w * cio + wbytes,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
            interpret=interpret,
        )(x_rows, *weight_args)
        out = out[:, : h * w].reshape(n, h, w, cio)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(n, n_blocks),
            in_specs=[pl.BlockSpec((1, h, w, cio), img, memory_space=pltpu.VMEM)]
            + weight_specs,
            out_specs=pl.BlockSpec((1, h, w, cio), img, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w, cio), jnp.float32),
            scratch_shapes=[pltpu.VMEM((h * w, cio), jnp.float32)] + mid_scratch,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * 2 * n * h * w * cio + n * wbytes,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024),
            interpret=interpret,
        )(x.astype(jnp.float32), *weight_args)
    return out[0] if squeeze else out

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


def winograd_mid_layer(
    h1,            # (H*W, Cmid) value — the reduce layer's output
    u2_ref,        # (16, Cmid, Cmid) F(2,3) transformed filter
    s2_row, b2_row,  # (1, Cmid) folded BN
    xpads,         # G zero-bordered scratch (mTh+2, mTw'+2, CG), CG <= 128
    h2gs,          # G scratch (H, W, CG) for the strided output assembly
    *,
    h: int,
    w: int,
    cmid: int,
    tw_pad: int,
    precision: str,
):
    """The block/stage megakernels' 3x3 layer as in-kernel F(2,3) Winograd
    (the same core the standalone kernel uses — winograd.py measured ~20%
    faster than the direct im2col GEMM at these shapes). h1 is scattered
    into <=128-lane padded staging groups, the shared transform/GEMM/
    inverse core runs, and the m x m output positions are strided-stored
    into per-group h2 buffers. Returns h2_groups (list of refs) — the
    consumer contracts the expand GEMM per group, so h2 is never
    lane-concatenated."""
    from winograd_tpu.kernels.winograd import (
        winograd_gemm_inverse,
        winograd_input_transform,
    )

    m = 2
    th = -(-h // m)
    tw = -(-w // m)
    cg = xpads[0].shape[-1]
    h1_3d = h1.reshape(h, w, cmid)
    for g, xp in enumerate(xpads):
        gsl = slice(g * cg, (g + 1) * cg)
        ph, pw = xp.shape[0], xp.shape[1]
        xp[0:1, :, :] = jnp.zeros((1, pw, cg), jnp.float32)
        xp[h + 1 :, :, :] = jnp.zeros((ph - h - 1, pw, cg), jnp.float32)
        xp[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cg), jnp.float32)
        xp[1 : h + 1, w + 1 :, :] = jnp.zeros((h, pw - w - 1, cg), jnp.float32)
        xp[1 : h + 1, 1 : w + 1, :] = h1_3d[:, :, gsl]
    # The core expects 4D (NB, ...) staging refs; reuse with NB=1 via
    # reshape-free indexing: wrap by adding a leading axis through .at?
    # Simpler: the core only slices dims (1, 2) with pl.Slice and dim 0
    # with ':' — give it the 3D refs through a tiny adapter.
    v_groups = winograd_input_transform(
        [_Lead1(xp) for xp in xpads], m=m, tiles_h=th, tw_pad=tw_pad, nb=1
    )
    y = winograd_gemm_inverse(v_groups, u2_ref, m=m, cg=cg, precision=precision)
    for oi in range(m):
        th_v = min(th, (h - 1 - oi) // m + 1)
        for oj in range(m):
            tw_v = min(tw, (w - 1 - oj) // m + 1)
            yy = jnp.maximum(y[oi][oj] * s2_row + b2_row, 0.0)
            yy = yy.reshape(th, tw_pad, cmid)
            for g, h2g in enumerate(h2gs):
                h2g[pl.Slice(oi, th_v, m), pl.Slice(oj, tw_v, m), :] = yy[
                    :th_v, :tw_v, g * cg : (g + 1) * cg
                ]
    return h2gs


class _Lead1:
    """Adapter presenting a 3D ref as the 4D (NB=1, ...) shape
    winograd_input_transform slices."""

    def __init__(self, ref):
        self._ref = ref
        self.shape = (1,) + tuple(ref.shape)

    def __getitem__(self, idx):
        assert idx[0] == slice(None), idx
        return self._ref[idx[1:]][None]


def _block_kernel_winograd(
    x_ref,     # (1, H, W, Cio)
    wr_ref,    # (Cio, Cmid)
    s1_ref, b1_ref,   # (1, Cmid)
    u2_ref,    # (16, Cmid, Cmid) F(2,3) filter artifact
    s2_ref, b2_ref,   # (1, Cmid)
    we_ref,    # (Cmid, Cio)
    s3_ref, b3_ref,   # (1, Cio)
    out_ref,   # (1, H, W, Cio)
    *scratch,  # G xpads (mTh+2, mTw'+2, CG) + G h2 buffers (H, W, CG)
    h: int,
    w: int,
    cio: int,
    cmid: int,
    cg: int,
    precision: str,
):
    hw = h * w
    n_groups = cmid // cg
    xpads = scratch[:n_groups]
    h2gs = scratch[n_groups:]
    x2 = x_ref[0].reshape(hw, cio)

    h1 = jnp.maximum(split_dot(x2, wr_ref[:], precision) * s1_ref[:] + b1_ref[:], 0.0)
    tw_pad = (xpads[0].shape[1] - 2) // 2
    h2gs = winograd_mid_layer(
        h1, u2_ref, s2_ref[:], b2_ref[:], xpads, h2gs,
        h=h, w=w, cmid=cmid, tw_pad=tw_pad, precision=precision,
    )
    # Expand GEMM contracted per channel group — h2 never concatenated.
    h3 = None
    for g, h2g in enumerate(h2gs):
        part = split_dot(
            h2g[:].reshape(hw, cg), we_ref[g * cg : (g + 1) * cg, :], precision
        )
        h3 = part if h3 is None else h3 + part
    h3 = h3 * s3_ref[:] + b3_ref[:]
    y = jnp.maximum(h3 + x2, 0.0)
    out_ref[0] = y.reshape(h, w, cio)


@functools.partial(jax.jit, static_argnames=("interpret", "precision", "mid_algo"))
def bottleneck_block_fused_pallas(
    x: jax.Array,
    params: dict,
    *,
    interpret: bool | None = None,
    precision: str = "bf16x3",
    mid_algo: str = "auto",
) -> jax.Array:
    """One-kernel bottleneck block. x: (H, W, Cio) or (N, H, W, Cio);
    params needs w_reduce/s_reduce/b_reduce, w9_mid/s_mid/b_mid,
    w_expand/s_expand/b_expand (see models/resnet.py).

    mid_algo selects the in-kernel 3x3 implementation: "winograd2" runs
    F(2,3) Winograd through the shared core (needs the u2_mid artifact,
    (16, Cmid, Cmid)); "direct" is the im2col GEMM; "auto" picks by
    measurement: winograd2 wins 2x on large maps (28x28: 7.5 vs 14.7 us)
    where its GEMM savings dominate, direct wins slightly at 14x14 with
    wide Cmid (the F(2,3) filter artifact is 16/9 the direct bytes)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cio = x.shape
    cmid = params["w_reduce"].shape[1]
    if mid_algo == "auto":
        mid_algo = (
            "winograd2" if "u2_mid" in params and h * w >= 28 * 28 else "direct"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    # bf16 weight-storage tier (see kernels/direct.py::split_dot "bf16w"):
    # halves the weight HBM reads; activations and BN rows stay f32.
    wdt = jnp.bfloat16 if precision == "bf16w" else jnp.float32
    wbytes_per = 2 if precision == "bf16w" else 4

    const = lambda i: (0, 0)
    flops = 2 * n * h * w * (cio * cmid + 9 * cmid * cmid + cmid * cio)
    common_pre = [
        pl.BlockSpec((1, h, w, cio), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cio, cmid), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
    ]
    common_post = [
        pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((cmid, cio), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cio), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cio), const, memory_space=pltpu.VMEM),
    ]
    if mid_algo == "winograd2":
        assert params["u2_mid"].shape == (16, cmid, cmid), params["u2_mid"].shape
        from winograd_tpu.kernels.winograd import _pad_tiles_w

        cg = 128 if cmid % 128 == 0 else cmid
        th, tw = -(-h // 2), -(-w // 2)
        tw_pad = _pad_tiles_w(tw)
        kernel = functools.partial(
            _block_kernel_winograd,
            h=h, w=w, cio=cio, cmid=cmid, cg=cg, precision=precision,
        )
        mid_spec = pl.BlockSpec((16, cmid, cmid), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        mid_arg = jnp.asarray(params["u2_mid"]).astype(wdt)
        scratch = [
            pltpu.VMEM((2 * th + 2, 2 * tw_pad + 2, cg), jnp.float32)
            for _ in range(cmid // cg)
        ] + [
            pltpu.VMEM((h, w, cg), jnp.float32) for _ in range(cmid // cg)
        ]
        mid_weight_elems = 16 * cmid * cmid
    else:
        assert mid_algo == "direct", mid_algo
        assert params["w9_mid"].shape == (9 * cmid, cmid), params["w9_mid"].shape
        kernel = functools.partial(
            _block_kernel, h=h, w=w, cio=cio, cmid=cmid, precision=precision
        )
        mid_spec = pl.BlockSpec((9 * cmid, cmid), const, memory_space=pltpu.VMEM)
        mid_arg = jnp.asarray(params["w9_mid"]).astype(wdt)
        scratch = [
            pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((h * w, 9 * cmid), jnp.float32),
        ]
        mid_weight_elems = 9 * cmid * cmid
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=common_pre + [mid_spec] + common_post,
        out_specs=pl.BlockSpec((1, h, w, cio), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cio), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * 2 * n * h * w * cio
            + wbytes_per * (cio * cmid * 2 + mid_weight_elems),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        jnp.asarray(params["w_reduce"]).astype(wdt),
        row(params["s_reduce"], cmid),
        row(params["b_reduce"], cmid),
        mid_arg,
        row(params["s_mid"], cmid),
        row(params["b_mid"], cmid),
        jnp.asarray(params["w_expand"]).astype(wdt),
        row(params["s_expand"], cio),
        row(params["b_expand"], cio),
    )
    return out[0] if squeeze else out

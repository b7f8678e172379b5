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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels.direct import split_dot

_BLOCK_KEYS = (
    "w_reduce", "s_reduce", "b_reduce", "w9_mid", "s_mid", "b_mid",
    "w_expand", "s_expand", "b_expand",
)


def stack_stage_params(params_list: List[dict]) -> dict:
    """Stack per-block params on a leading block axis (BN as (B, 1, C));
    the F(2,3) artifact (u2_mid) is stacked too when every block has it,
    enabling the winograd2 mid-layer."""
    out = {}
    keys = _BLOCK_KEYS + (
        ("u2_mid",) if all("u2_mid" in p for p in params_list) else ()
    )
    for key in keys:
        arrs = [jnp.asarray(p[key], jnp.float32) for p in params_list]
        if arrs[0].ndim == 1:
            arrs = [a.reshape(1, -1) for a in arrs]
        out[key] = jnp.stack(arrs)
    return out


def _im2col_same3x3(xpad_ref, h1_hwc, col_write, *, h: int, w: int, cmid: int):
    """SAME-pad 3x3 im2col staging shared by the stage kernels (f32 and
    int8, image-outer and weight-resident): zero the one-pixel border of
    xpad_ref, scatter h1 into the interior, and emit the 9 shifted
    (H*W, Cmid) patches via col_write(tap_index, patch)."""
    xpad_ref[0:1, :, :] = jnp.zeros((1, w + 2, cmid), jnp.float32)
    xpad_ref[h + 1 :, :, :] = jnp.zeros((1, w + 2, cmid), jnp.float32)
    xpad_ref[1 : h + 1, 0:1, :] = jnp.zeros((h, 1, cmid), jnp.float32)
    xpad_ref[1 : h + 1, w + 1 :, :] = jnp.zeros((h, 1, cmid), jnp.float32)
    xpad_ref[1 : h + 1, 1 : w + 1, :] = h1_hwc
    for r in range(3):
        for s in range(3):
            patch = xpad_ref[r : r + h, s : s + w, :].reshape(h * w, cmid)
            col_write(3 * r + s, patch)


def _block_compute(
    x2,        # (H*W, Cio) value — the block input rows
    wr_ref,    # (1, Cio, Cmid)     block b's weights
    s1_ref, b1_ref,   # (1, 1, Cmid)
    w9_ref,    # (1, 9*Cmid, Cmid) direct layout, OR (1, 16, Cmid, Cmid) F(2,3)
    s2_ref, b2_ref,   # (1, 1, Cmid)
    we_ref,    # (1, Cmid, Cio)
    s3_ref, b3_ref,   # (1, 1, Cio)
    scratch,   # direct: xpad (H+2,W+2,Cmid) + col (H*W, 9*Cmid);
               # winograd2: G xpads + G h2 buffers (H, W, CG)
    *,
    h: int,
    w: int,
    cmid: int,
    mid_algo: str,
    precision: str,
):
    """One identity bottleneck block on one image's rows: reduce GEMM ->
    3x3 mid layer (direct im2col or in-kernel F(2,3) Winograd) -> expand
    GEMM -> residual add + ReLU. Shared by the image-outer streaming
    kernel and the block-outer weight-resident batched kernel."""
    hw = h * w
    h1 = jnp.maximum(split_dot(x2, wr_ref[0], precision) * s1_ref[0] + b1_ref[0], 0.0)

    if mid_algo == "winograd2":
        from winograd_tpu.kernels.block import winograd_mid_layer

        cg = scratch[0].shape[-1]
        n_groups = cmid // cg
        xpads, h2gs = scratch[:n_groups], scratch[n_groups:]
        tw_pad = (xpads[0].shape[1] - 2) // 2
        h2gs = winograd_mid_layer(
            h1, w9_ref[0], s2_ref[0], b2_ref[0], xpads, h2gs,
            h=h, w=w, cmid=cmid, tw_pad=tw_pad, precision=precision,
        )
        h3 = None
        for g, h2g in enumerate(h2gs):
            part = split_dot(
                h2g[:].reshape(hw, cg),
                we_ref[0, g * cg : (g + 1) * cg, :],
                precision,
            )
            h3 = part if h3 is None else h3 + part
        h3 = h3 * s3_ref[0] + b3_ref[0]
    else:
        xpad_ref, col_ref = scratch

        def col_write(t, patch):
            col_ref[:, t * cmid : (t + 1) * cmid] = patch

        _im2col_same3x3(
            xpad_ref, h1.reshape(h, w, cmid), col_write, h=h, w=w, cmid=cmid
        )
        h2 = jnp.maximum(
            split_dot(col_ref[:], w9_ref[0], precision) * s2_ref[0] + b2_ref[0], 0.0
        )
        h3 = split_dot(h2, we_ref[0], precision) * s3_ref[0] + b3_ref[0]

    return jnp.maximum(h3 + x2, 0.0)


def _stage_kernel(
    x_ref,     # (1, H, W, Cio)
    wr_ref, s1_ref, b1_ref, w9_ref, s2_ref, b2_ref, we_ref, s3_ref, b3_ref,
    out_ref,   # (1, H, W, Cio)
    act_ref,   # scratch (H*W, Cio)  persists across grid steps
    *scratch,
    h: int,
    w: int,
    cio: int,
    cmid: int,
    n_blocks: int,
    mid_algo: str,
    precision: str,
):
    hw = h * w
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _load_input():
        act_ref[:] = x_ref[0].reshape(hw, cio)

    y = _block_compute(
        act_ref[:],
        wr_ref, s1_ref, b1_ref, w9_ref, s2_ref, b2_ref, we_ref, s3_ref, b3_ref,
        scratch, h=h, w=w, cmid=cmid, mid_algo=mid_algo, precision=precision,
    )
    act_ref[:] = y

    @pl.when(b == n_blocks - 1)
    def _store_output():
        out_ref[0] = y.reshape(h, w, cio)


def _pad_rows(hw: int) -> int:
    """Per-image row count padded to the f32 sublane tile (8): DMAs and
    dynamic indexing into the (N, rows, C) resident activation scratch only
    lower when the sliced row extent matches Mosaic's tiled extent."""
    return -(-hw // 8) * 8


def _stage_kernel_resident(
    x_hbm,     # (N, HWp, Cio) in ANY (HBM) — manually DMA'd, never revisited
    wr_ref, s1_ref, b1_ref, w9_ref, s2_ref, b2_ref, we_ref, s3_ref, b3_ref,
    out_hbm,   # (N, HWp, Cio) in ANY (HBM)
    act_ref,   # scratch (N, HWp, Cio) — every image's activation, resident
    sem,       # DMA semaphores (2,): [0] image load, [1] image store
    xpad_ref,  # scratch (H+2, W+2, Cmid) per-image im2col staging
    col_ref,   # scratch (N, HWp, 9*Cmid) ALL images' im2col rows
    *,
    h: int,
    w: int,
    cio: int,
    cmid: int,
    n_blocks: int,
    n: int,
    precision: str,
):
    """Block-OUTER batched stage: grid (n_blocks,). The weight BlockSpecs
    are indexed by the block axis, so Pallas's pipeline fetches each
    block's weights ONCE for the whole batch (the image-outer kernel
    re-streams them per image: N x the HBM traffic — the bound at conv5_x
    geometry). All N images' activations persist in one VMEM scratch, and
    the reduce / 3x3 / expand GEMMs run over ALL images' rows at once
    (N*HWp rows — full MXU row blocks even at conv5_x's 49 rows/image);
    only the spatial im2col staging loops per image. Rows are padded to
    HWp = roundup(H*W, 8) (_pad_rows) so the (N, HWp, C) <-> (N*HWp, C)
    reshapes are layout-free and the per-image DMA slices stay aligned.
    Pad rows carry zeros in x; through the GEMM+BN chain they stay finite
    (never NaN: col pad rows are zeroed once) and are clipped after the
    kernel."""
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
        split_dot(allact, wr_ref[0], precision) * s1_ref[0] + b1_ref[0], 0.0
    )
    for i in range(n):
        h1 = h1all[i * hw_pad : i * hw_pad + hw].reshape(h, w, cmid)

        def col_write(t, patch, i=i):
            col_ref[i, :hw, t * cmid : (t + 1) * cmid] = patch

        _im2col_same3x3(xpad_ref, h1, col_write, h=h, w=w, cmid=cmid)
    h2all = jnp.maximum(
        split_dot(
            col_ref[:].reshape(n * hw_pad, 9 * cmid), w9_ref[0], precision
        )
        * s2_ref[0]
        + b2_ref[0],
        0.0,
    )
    h3all = split_dot(h2all, we_ref[0], precision) * s3_ref[0] + b3_ref[0]
    yall = jnp.maximum(h3all + allact, 0.0)
    act_ref[:] = yall.reshape(act_ref.shape)

    @pl.when(b == n_blocks - 1)
    def _store_images():
        for i in range(n):
            cp = pltpu.make_async_copy(act_ref.at[i], out_hbm.at[i], sem.at[1])
            cp.start()
            cp.wait()


@functools.partial(
    jax.jit, static_argnames=("interpret", "precision", "mid_algo", "resident")
)
def resnet_stage_fused_pallas(
    x: jax.Array,
    stacked: dict,
    *,
    interpret: bool | None = None,
    precision: str = "bf16x3",
    mid_algo: str = "auto",
    resident: bool | None = None,
) -> jax.Array:
    """Run a whole stage of identity bottleneck blocks in ONE kernel.

    x: (H, W, Cio) or (N, H, W, Cio); stacked from stack_stage_params.
    mid_algo as in kernels/block.py: "auto" streams the F(2,3) filter and
    runs the winograd2 mid-layer on large maps (2x at 28x28), the direct
    im2col GEMM otherwise.

    precision="bf16w" selects the bf16 weight-STORAGE tier: the streamed
    weight matrices are rounded to bfloat16 before the call, halving the
    HBM bytes per block that bound wide geometries (conv5_x streams
    17.8 MB/block in f32) at a ~1e-3 relative-error tier bound
    (kernels/direct.py::split_dot)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cio = x.shape
    n_blocks, _, cmid = stacked["w_reduce"].shape
    if mid_algo == "auto":
        mid_algo = (
            "winograd2" if "u2_mid" in stacked and h * w >= 28 * 28 else "direct"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # bf16 weight-storage tier: round the streamed matrices offline-style;
    # BN rows and activations stay f32.
    wdt = jnp.bfloat16 if precision == "bf16w" else jnp.float32
    wbytes_per = 2 if precision == "bf16w" else 4

    # Block-outer weight-resident layout for batches: each block's weights
    # are fetched from HBM once for ALL images instead of once per image,
    # and the GEMMs run over all images' rows at once. At n_blocks == 1 the
    # image-outer layout's constant weight index already fetches once per
    # batch (see kernels/transition.py); the row-batched kernel covers the
    # direct-im2col mid only (winograd2 stages — conv3_x — are compute-
    # bound with negligible weight traffic, so they keep the image-outer
    # layout).
    if resident is None:
        # Default OFF: measured end-to-end (13-block backbone at N=8, v5e)
        # the explicit resident layout never beats the image-outer layout
        # in-chain — Pallas already skips re-fetching revisited blocks, the
        # block-megakernel route keeps weights batch-constant via its index
        # maps, and the resident layout's costs (XLA pad/slice boundary
        # copies, serialized per-image DMAs, lost x/out pipelining) eat the
        # streaming savings even at conv5_x's 17.8 MB/block (selective
        # resident: 1324.5 us vs image-outer 1304.7). Kept as an explicit
        # opt-in for isolated weight-bound single-component serving.
        resident = False
    resident = resident and n > 1 and mid_algo == "direct"
    if resident:
        kernel = functools.partial(
            _stage_kernel_resident,
            h=h, w=w, cio=cio, cmid=cmid, n_blocks=n_blocks,
            n=n, precision=precision,
        )
        blk = lambda shape: pl.BlockSpec(
            (1,) + shape,
            (lambda b: (b,) + (0,) * len(shape)),
            memory_space=pltpu.VMEM,
        )
    else:
        kernel = functools.partial(
            _stage_kernel,
            h=h, w=w, cio=cio, cmid=cmid, n_blocks=n_blocks,
            mid_algo=mid_algo, precision=precision,
        )
        blk = lambda shape: pl.BlockSpec(
            (1,) + shape,
            (lambda i, b: (b,) + (0,) * len(shape)),
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
        mid_arg = stacked["u2_mid"].astype(wdt)
        mid_scratch = [
            pltpu.VMEM((2 * th + 2, 2 * tw_pad + 2, cg), jnp.float32)
            for _ in range(cmid // cg)
        ] + [pltpu.VMEM((h, w, cg), jnp.float32) for _ in range(cmid // cg)]
        mid_weight_elems = 16 * cmid * cmid
    else:
        mid_spec = blk((9 * cmid, cmid))
        mid_arg = stacked["w9_mid"].astype(wdt)
        mid_scratch = [
            pltpu.VMEM((h + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((h * w, 9 * cmid), jnp.float32),
        ]
        mid_weight_elems = 9 * cmid * cmid
    weight_bytes = wbytes_per * n_blocks * (2 * cio * cmid + mid_weight_elems)
    # VMEM footprint: double-buffered weights + activation scratch (+N for
    # the resident layout) + mid scratch; ~17 MB at conv4_x, ~30 MB for a
    # streamed conv5_x block. Raise the compiler's conservative 16 MB
    # scoped cap to the estimate (v5e has far more physical VMEM).
    # Activation VMEM: resident keeps all N images' act AND im2col rows in
    # scratch (x/out live in HBM); the streaming layout holds
    # double-buffered x/out blocks (4 images' worth) plus one act scratch.
    if resident:
        act_elems = n * _pad_rows(h * w) * (cio + 9 * cmid) + (h + 2) * (w + 2) * cmid
    else:
        act_elems = 5 * h * w * cio + sum(
            int(np.prod(s.shape)) for s in mid_scratch
        )
    # 1.5x margin: the compiler's scoped-stack accounting adds copy/layout
    # temporaries beyond the declared buffers (1.25x measured 1.5 MB short
    # at conv4_x batch-8).
    vmem_limit = max(
        24 * 1024 * 1024,
        int(
            1.5
            * (
                2 * wbytes_per * (2 * cio * cmid + mid_weight_elems)
                + 4 * act_elems
            )
        ),
    )
    if resident:
        hw_pad = _pad_rows(h * w)
        x_rows = x.astype(jnp.float32).reshape(n, h * w, cio)
        if hw_pad != h * w:
            x_rows = jnp.pad(x_rows, ((0, 0), (0, hw_pad - h * w), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [
                blk((cio, cmid)), blk((1, cmid)), blk((1, cmid)),
                mid_spec, blk((1, cmid)), blk((1, cmid)),
                blk((cmid, cio)), blk((1, cio)), blk((1, cio)),
            ],
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
                bytes_accessed=4 * 2 * n * h * w * cio + weight_bytes,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
            interpret=interpret,
        )(
            x_rows,
            stacked["w_reduce"].astype(wdt), stacked["s_reduce"], stacked["b_reduce"],
            mid_arg, stacked["s_mid"], stacked["b_mid"],
            stacked["w_expand"].astype(wdt), stacked["s_expand"], stacked["b_expand"],
        )
        out = out[:, : h * w].reshape(n, h, w, cio)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(n, n_blocks),
            in_specs=[
                pl.BlockSpec((1, h, w, cio), img, memory_space=pltpu.VMEM),
                blk((cio, cmid)), blk((1, cmid)), blk((1, cmid)),
                mid_spec, blk((1, cmid)), blk((1, cmid)),
                blk((cmid, cio)), blk((1, cio)), blk((1, cio)),
            ],
            out_specs=pl.BlockSpec((1, h, w, cio), img, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w, cio), jnp.float32),
            scratch_shapes=[pltpu.VMEM((h * w, cio), jnp.float32)] + mid_scratch,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * 2 * n * h * w * cio + n * weight_bytes,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
            interpret=interpret,
        )(
            x.astype(jnp.float32),
            stacked["w_reduce"].astype(wdt), stacked["s_reduce"], stacked["b_reduce"],
            mid_arg, stacked["s_mid"], stacked["b_mid"],
            stacked["w_expand"].astype(wdt), stacked["s_expand"], stacked["b_expand"],
        )
    return out[0] if squeeze else out

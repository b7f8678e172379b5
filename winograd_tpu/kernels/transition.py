"""The stride-2 ResNet transition block as ONE fused Pallas kernel.

Round 1 composed the downsample (stage-transition) block from an XLA
strided im2col plus the fused pointwise GEMM kernels
(models/downsample.py); this kernel gives the transition block the same
per-layer fusion discipline the reference applies to every op it ships
(/root/reference/Kernel128_one.cu:24-54): the whole block —

    1x1 reduce + BN + ReLU  ->  stride-2 3x3 (strided im2col in VMEM)
    + BN + ReLU  ->  1x1 expand + BN  ->  stride-2 1x1 projection skip
    ->  add  ->  ReLU

— runs in a single Pallas program. Activations never leave VMEM between
layers; both stride-2 subsamplings (the 3x3's and the projection
shortcut's) are Mosaic strided vector loads from <=128-channel staging
groups (strided slices only lower when the ref's minor dim is a single
lane tile).

The wide output layers (expand + projection) are output-channel tiled on
the grid so the big transitions (ResNet-50 conv4_x -> conv5_x: Cout 2048,
~24 MB of f32 weights) stream those weights while the reduce/3x3 weights
and the h2 / subsampled-skip activations stay resident in scratch across
the j steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winograd_tpu.kernels.direct import split_dot


def _transition_kernel(
    x_ref,     # (1, H, W, Cin)       resident across j steps
    wr_ref,    # (Cin, Cmid)          resident
    s1_ref, b1_ref,   # (1, Cmid)
    w9_ref,    # (9*Cmid, Cmid)       resident
    s2_ref, b2_ref,   # (1, Cmid)
    wep_ref,   # (Cmid+Cin, TILE_CO)  streamed over j: the expand AND
               # projection weights, BN scales folded in offline and the
               # two matrices row-concatenated — ONE double-buffered
               # stream and ONE MXU GEMM where round 2 had two of each
    bep_ref,   # (1, TILE_CO)         b_expand + b_proj
    out_ref,   # (1, HO, WO, TILE_CO)
    h2xs_ref,  # scratch (HO*WO, Cmid+Cin): [h2 | subsampled skip input],
               # persists across j — the combined GEMM's row operand
    col_ref,   # scratch (HO*WO, 9*Cmid)
    *xpads,    # G_mid padded-h1 groups (H+2, W+2, CGm) then
               # G_in input groups (H, W, CGi), all minor dims <= 128
    h: int,
    w: int,
    cin: int,
    cmid: int,
    n_mid_groups: int,
    precision: str,
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
        # --- 1x1 reduce + BN + ReLU (MXU GEMM, epilogue on VPU) ---
        x2 = x_ref[0].reshape(h * w, cin)
        h1 = jnp.maximum(
            split_dot(x2, wr_ref[:], precision) * s1_ref[:] + b1_ref[:], 0.0
        )
        h1 = h1.reshape(h, w, cmid)

        # --- stride-2 3x3 + BN + ReLU via strided im2col in VMEM ---
        # SAME padding for stride 2: taps 2o + r - 1, r in {0,1,2}; pad 1
        # on top/left, and the staging is sized so the strided reads stay
        # inside (zeroed) bounds on the bottom/right.
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
        h2xs_ref[:, :cmid] = jnp.maximum(
            split_dot(col_ref[:], w9_ref[:], precision) * s2_ref[:] + b2_ref[:],
            0.0,
        )

        # --- subsample the block input for the projection shortcut ---
        # (a stride-2 1x1 conv IS subsample + GEMM) — into the combined
        # row operand next to h2.
        for g, xg in enumerate(ins):
            xg[:, :, :] = x_ref[0, :, :, g * cgi : (g + 1) * cgi]
            h2xs_ref[:, cmid + g * cgi : cmid + (g + 1) * cgi] = xg[
                pl.Slice(0, ho, 2), pl.Slice(0, wo, 2), :
            ].reshape(hwo, cgi)

    # --- per-j: expand + projection as ONE GEMM over the combined
    # (Cmid+Cin) contraction (scales pre-folded), add bias, ReLU ---
    y = split_dot(h2xs_ref[:], wep_ref[:], precision) + bep_ref[:]
    tile_co = out_ref.shape[-1]
    out_ref[0] = jnp.maximum(y, 0.0).reshape(ho, wo, tile_co)


def _transition_kernel_resident(
    x_hbm,     # (N, H, W, Cin) in ANY (HBM) — manually DMA'd at j == 0
    wr_ref,    # (Cin, Cmid)          resident
    s1_ref, b1_ref,   # (1, Cmid)
    w9_ref,    # (9*Cmid, Cmid)       resident
    s2_ref, b2_ref,   # (1, Cmid)
    wep_ref,   # (Cmid+Cin, TILE_CO)  streamed over outer j — fetched ONCE;
               # expand+projection concatenated, BN scales folded offline
    bep_ref,   # (1, TILE_CO)         b_expand + b_proj
    out_ref,   # (N, HO, WO, TILE_CO)
    xin_ref,   # scratch (HWp, Cin)         DMA landing buffer (padded rows)
    h2xs_ref,  # scratch (N, HWOp, Cmid+Cin): every image's [mid output |
               # subsampled skip], resident — the combined GEMM row operand
    col_ref,   # scratch (HO*WO, 9*Cmid)
    sem,       # DMA semaphore
    *xpads,
    h: int,
    w: int,
    cin: int,
    cmid: int,
    n_mid_groups: int,
    n: int,
    precision: str,
):
    """Output-tile-OUTER batched transition: grid (n_j,). The wide expand/
    projection weights are indexed by the grid axis, so each tile streams
    from HBM once for the whole batch (the image-outer kernel re-streams
    them per image — N x the traffic that bounds the conv4_x -> conv5_x
    transition), and the per-tile GEMMs contract ALL images' rows at once
    (N*HWOp rows — full MXU row blocks even at 7x7's 49 rows/image). The
    front (reduce + stride-2 3x3 + skip subsample) runs once per image at
    j == 0 into that image's rows of the resident h2/xs scratch, padded to
    HWOp = roundup(HO*WO, 8) so reshapes are layout-free
    (kernels/stage.py::_pad_rows)."""
    ho, wo = -(-h // 2), -(-w // 2)
    hwo = ho * wo
    hwo_pad = h2xs_ref.shape[1]
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
                split_dot(x2, wr_ref[:], precision) * s1_ref[:] + b1_ref[:], 0.0
            )
            h1 = h1.reshape(h, w, cmid)
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
            h2xs_ref[i, :, :cmid] = pad_rows(
                jnp.maximum(
                    split_dot(col_ref[:], w9_ref[:], precision) * s2_ref[:]
                    + b2_ref[:],
                    0.0,
                )
            )
            for g, xg in enumerate(ins):
                gsl = slice(g * cgi, (g + 1) * cgi)
                xg[:, :, :] = x2[:, gsl].reshape(h, w, cgi)
                h2xs_ref[i, :, cmid + g * cgi : cmid + (g + 1) * cgi] = pad_rows(
                    xg[pl.Slice(0, ho, 2), pl.Slice(0, wo, 2), :].reshape(hwo, cgi)
                )

    rows = h2xs_ref[:].reshape(n * hwo_pad, cmid + cin)
    y = split_dot(rows, wep_ref[:], precision) + bep_ref[:]
    tile_co = out_ref.shape[-1]
    y = jnp.maximum(y, 0.0).reshape(n, hwo_pad, tile_co)
    out_ref[:] = y[:, :hwo, :].reshape(n, ho, wo, tile_co)


def fuse_transition_weights(params):
    """Offline fusion of the transition's wide output layers: fold the
    per-output-channel BN scales into the expand/projection weights and
    row-concatenate them so the kernel streams ONE (Cmid+Cin, Cout) matrix
    and runs ONE MXU GEMM over the combined [h2 | skip] rows — identical
    math ((h2 @ we)*s3 + (xs @ wp)*sp == [h2|xs] @ [we*s3; wp*sp]), half
    the double-buffered streams, 2x the contraction depth per GEMM.

    Returns (wep, bep) as f32. Engines/checkpoint export call this ONCE and
    store the result under params keys "wep"/"bep"; when params arrive as
    jit arguments (the engine serving path) that keeps the ~25 MB
    conv4->5 fold off the per-call device timeline."""
    cout = params["w_expand"].shape[1]
    wep = jnp.concatenate(
        [
            jnp.asarray(params["w_expand"], jnp.float32)
            * jnp.asarray(params["s_expand"], jnp.float32)[None, :],
            jnp.asarray(params["w_proj"], jnp.float32)
            * jnp.asarray(params["s_proj"], jnp.float32)[None, :],
        ],
        axis=0,
    )
    bep = jnp.asarray(params["b_expand"], jnp.float32) + jnp.asarray(
        params["b_proj"], jnp.float32
    )
    return wep, bep.reshape(1, cout)


@functools.partial(
    jax.jit, static_argnames=("tile_co", "interpret", "precision", "resident")
)
def transition_block_fused_pallas(
    x: jax.Array,
    params: dict,
    *,
    tile_co: int | None = None,
    interpret: bool | None = None,
    precision: str = "highest",
    resident: bool | None = None,
) -> jax.Array:
    """One-kernel stride-2 transition block. x: (H, W, Cin) or
    (N, H, W, Cin); params needs w_reduce/s_reduce/b_reduce, w9_mid (direct
    im2col layout, kernels/direct.py)/s_mid/b_mid, w_expand/s_expand/
    b_expand, w_proj/s_proj/b_proj (see models/downsample.py). Returns
    (..., ceil(H/2), ceil(W/2), Cout).

    precision="bf16w" selects the bf16 weight-storage tier: all four
    weight matrices are rounded to bfloat16, halving the streamed bytes
    that bound the wide transitions (conv4_x -> conv5_x: ~24 MB f32) at a
    ~1e-3 relative-error tier bound (kernels/direct.py::split_dot)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    cmid = params["w_reduce"].shape[1]
    cout = params["w_expand"].shape[1]
    assert params["w9_mid"].shape == (9 * cmid, cmid), params["w9_mid"].shape
    assert params["w_proj"].shape == (cin, cout), params["w_proj"].shape
    ho, wo = -(-h // 2), -(-w // 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_co is None:
        from winograd_tpu.kernels.pointwise import mxu_lane_divisor

        # Stream the wide output layers in lane-tile slices when the full
        # expand+projection weights would not fit comfortably in VMEM.
        tile_co = (
            cout
            if (cmid + cin) * cout * 4 <= 4 * 2**20
            else mxu_lane_divisor(cout, 128)
        )
    assert cout % tile_co == 0, (cout, tile_co)
    n_j = cout // tile_co

    cgm = 128 if cmid % 128 == 0 else cmid
    cgi = 128 if cin % 128 == 0 else cin
    n_mid = cmid // cgm
    # Staging bounds: 3x3 taps reach 2*(ho-1)+2 = 2*ho, +1 for the left pad.
    ph, pw = 2 * ho + 2, 2 * wo + 2

    def row(v, c):
        return jnp.asarray(v, jnp.float32).reshape(1, c)

    wdt = jnp.bfloat16 if precision == "bf16w" else jnp.float32
    wbytes_per = 2 if precision == "bf16w" else 4

    # Offline fusion of the wide output layers (see fuse_transition_weights):
    # prefer the precomputed artifact ("wep"/"bep" — engine init and
    # checkpoint export add them, keeping the fold out of the serving call
    # when params are jit ARGUMENTS); fall back to deriving in-trace, which
    # jit-with-closed-over-params constant-folds to the same thing.
    if "wep" in params:
        wep = jnp.asarray(params["wep"]).astype(wdt)
        bep = jnp.asarray(params["bep"], jnp.float32).reshape(1, cout)
        assert wep.shape == (cmid + cin, cout), wep.shape
    else:
        wep, bep = fuse_transition_weights(params)
        wep = wep.astype(wdt)
        bep = bep.reshape(1, cout)

    # Output-tile-outer weight-resident layout for batches: each expand/
    # projection tile streams from HBM once for ALL images instead of once
    # per image (kernels/stage.py applies the same idea to whole stages).
    # Only worth it when the output is actually tiled (n_j > 1) — at
    # n_j == 1 the image-outer layout's constant weight index already
    # fetches once per batch, and the resident path's blocking per-image
    # DMA measured slower (mode 11 int8: 120 vs 78 us at N=8).
    if resident is None:
        # Default OFF: the image-outer layout's per-(image, tile) weight
        # re-fetch fully overlaps the per-step GEMMs in practice (trans12
        # f32 N=8: 298.2 us image-outer vs 301.8 resident), and in-chain
        # the resident layout's boundary pad/slice copies cost more than
        # the streaming it saves (see kernels/stage.py). Explicit opt-in
        # only.
        resident = False
    resident = resident and n > 1 and n_j > 1
    if resident:
        kernel = functools.partial(
            _transition_kernel_resident,
            h=h, w=w, cin=cin, cmid=cmid, n_mid_groups=n_mid, n=n,
            precision=precision,
        )
        res = lambda j: (0, 0)  # resident weight blocks
        stream = lambda j: (0, j)  # fetched once per grid step
        out_idx = lambda j: (0, 0, 0, j)
    else:
        kernel = functools.partial(
            _transition_kernel,
            h=h, w=w, cin=cin, cmid=cmid, n_mid_groups=n_mid,
            precision=precision,
        )
        res = lambda i, j: (0, 0)
        stream = lambda i, j: (0, j)
        out_idx = lambda i, j: (i, 0, 0, j)
    flops = 2 * n * (
        h * w * cin * cmid
        + ho * wo * (9 * cmid * cmid + cmid * cout + cin * cout)
    )
    weight_bytes = wbytes_per * (cin * cmid + 9 * cmid * cmid + (cmid + cin) * cout)
    if resident:
        from winograd_tpu.kernels.stage import _pad_rows

        hw_pad = _pad_rows(h * w)
        hwo_pad = _pad_rows(ho * wo)
        scratch_shapes = [
            pltpu.VMEM((hw_pad, cin), jnp.float32),  # DMA landing buffer
            pltpu.VMEM((n, hwo_pad, cmid + cin), jnp.float32),
            pltpu.VMEM((ho * wo, 9 * cmid), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((ho * wo, cmid + cin), jnp.float32),
            pltpu.VMEM((ho * wo, 9 * cmid), jnp.float32),
        ]
    scratch_shapes = (
        scratch_shapes
        + [pltpu.VMEM((ph, pw, cgm), jnp.float32) for _ in range(n_mid)]
        + [pltpu.VMEM((h, w, cgi), jnp.float32) for _ in range(cin // cgi)]
    )
    if resident:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        grid = (n_j,)
        # Rows layout, padded to the sublane tile, so the per-image DMA
        # slice extents match Mosaic's tiled extents.
        x_arg = x.astype(jnp.float32).reshape(n, h * w, cin)
        if hw_pad != h * w:
            x_arg = jnp.pad(x_arg, ((0, 0), (0, hw_pad - h * w), (0, 0)))
    else:
        in_specs = [
            pl.BlockSpec(
                (1, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        grid = (n, n_j)
        x_arg = x.astype(jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs
        + [
            pl.BlockSpec((cin, cmid), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cmid, cmid), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid + cin, tile_co), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), stream, memory_space=pltpu.VMEM),
        ],
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
            + (1 if resident else n) * weight_bytes,
            transcendentals=0,
        ),
        # Resident weights + streamed blocks + staging can exceed the
        # compiler's conservative default scoped cap at the conv4_x->conv5_x
        # geometry (~19 MB); same override rationale as kernels/stage.py.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(28 + (4 * n if resident else 0)) * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x_arg,
        jnp.asarray(params["w_reduce"]).astype(wdt),
        row(params["s_reduce"], cmid),
        row(params["b_reduce"], cmid),
        jnp.asarray(params["w9_mid"]).astype(wdt),
        row(params["s_mid"], cmid),
        row(params["b_mid"], cmid),
        wep,
        bep,
    )
    return out[0] if squeeze else out

"""Pipeline parallelism over a bottleneck stage (GPipe-style, shard_map).

The deepest model family here (ResNet-50 conv4_x: 6 chained bottlenecks) is
the natural pipeline target: split the blocks across a "pipe" mesh axis,
stream microbatches through, hand activations to the next stage with
jax.lax.ppermute over ICI. Schedule is plain GPipe: M microbatches take
M + P - 1 steps on P stages (the P-1 bubble steps compute on stale buffers
and are masked out of the output).

Layout: per-stage block parameters are STACKED on a leading axis sharded
over "pipe" (every stage owns the same number of blocks, so the stack is
dense); inputs/outputs live on stage 0 / stage P-1 respectively and the
result is reconstituted with one psum (only the last stage contributes).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from winograd_tpu.ops import jnp_ops


# Jitted classifier-pipeline programs, keyed by (mesh, geometry, param
# structure) — see pipelined_resnet50_inference.
_R50_PIPE_CACHE: dict = {}


def make_pipe_mesh(n_stages: int) -> Mesh:
    devices = jax.devices()
    assert len(devices) >= n_stages, (len(devices), n_stages)
    return Mesh(np.asarray(devices[:n_stages]), axis_names=("pipe",))


def _stack_stage_params(params_list: List[dict], n_stages: int) -> dict:
    """(P stages, blocks_per_stage, ...) stacked params, pipe-shardable.

    Keys are taken from the blocks themselves (all blocks must agree), so
    fused-kernel param sets (w9_mid/u_mid offline artifacts) pipeline the
    same way as the raw XLA-block set."""
    n_blocks = len(params_list)
    assert n_blocks % n_stages == 0, (n_blocks, n_stages)
    keys = sorted(params_list[0])
    assert all(sorted(p) == keys for p in params_list), "blocks disagree on param keys"
    bps = n_blocks // n_stages
    out = {}
    for key in keys:
        per_stage = [
            jnp.stack([jnp.asarray(params_list[s * bps + i][key]) for i in range(bps)])
            for s in range(n_stages)
        ]
        out[key] = jnp.stack(per_stage)  # (P, bps, ...)
    return out


def pipelined_stage_inference(
    mesh: Mesh,
    params_list: List[dict],
    x: jax.Array,
    microbatch: int,
    block_fn: Optional[Callable] = None,
) -> jax.Array:
    """Run a stack of bottleneck blocks as a P-stage pipeline.

    x: (N, H, W, C) with N % microbatch == 0; params_list: one dict per
    block. block_fn defaults to the XLA block; pass e.g.
    models.resnet.bottleneck_block_pallas (with w9_mid in the params) to
    pipeline the fused megakernel.
    """
    n_stages = mesh.shape["pipe"]
    block_fn = block_fn or jnp_ops.bottleneck_block
    n, h, w, c = x.shape
    assert n % microbatch == 0, (n, microbatch)
    m = n // microbatch
    xm = x.reshape(m, microbatch, h, w, c)
    stacked = _stack_stage_params(params_list, n_stages)
    keys = sorted(params_list[0])
    bps = len(params_list) // n_stages

    def run_stage(buf, my_params):
        for i in range(bps):
            p = {k: my_params[k][0, i] for k in keys}
            buf = block_fn(buf, p)
        return buf

    def local_fn(xm_l, my_params):
        stage = jax.lax.axis_index("pipe")
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(carry, t):
            buf, outs = carry
            # Stage 0 injects microbatch t (clamped; bubble steps masked later).
            x_in = xm_l[jnp.minimum(t, m - 1)]
            cur = jnp.where(stage == 0, x_in, buf)
            # GPipe bubble: stage s only holds real data for microbatch
            # t - s in [0, m) — skip the compute entirely on bubble steps
            # (a runtime branch, not a select: the stale-buffer FLOPs the
            # round-1 schedule burned are gone).
            active = jnp.logical_and(t >= stage, t - stage < m)
            y = jax.lax.cond(
                active, lambda b: run_stage(b, my_params), lambda b: b, cur
            )
            # Last stage's result at step t is microbatch t - (P - 1).
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            outs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_slice(
                    o, y[None], (jnp.maximum(out_idx, 0), 0, 0, 0, 0)
                ),
                lambda o: o,
                outs,
            )
            buf = jax.lax.ppermute(y, "pipe", perm)
            return (buf, outs), None

        buf0 = jnp.zeros_like(xm_l[0])
        outs0 = jnp.zeros_like(xm_l)
        (_, outs), _ = jax.lax.scan(
            step, (buf0, outs0), jnp.arange(m + n_stages - 1)
        )
        # Only the last stage holds real outputs; reconstitute with one psum.
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), "pipe"
        )

    p_specs = {k: P("pipe") for k in keys}
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), p_specs),
        out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(fn)(xm, stacked)
    return out.reshape(n, h, w, c)


def _classifier_segments(params, img_hw: int, precision=None):
    """Decompose the classifier into pipeline segments at BLOCK
    granularity: [stem+projection entry], each stride-2 transition, each
    residual block. Returns (segs, run_builder, head_fn, nc):

    * segs — (apply_fn(a, prm), nominal_flops, out_shape, meta) with meta
      one of ("stem",), ("tr", si), ("blk", si, bi); costs and boundary
      shapes come from the weight shapes in params and the tracked
      feature-map side (no tracing), so any depth (ResNet-50/101/152)
      partitions correctly;
    * run_builder(si, bi, bj) — fuses the contiguous identity run
      [bi, bj] of stage si into ONE stage-kernel call (weight streaming,
      activation VMEM-resident across the run — per-block calls would
      round-trip HBM between blocks);
    * head_fn(a, prm) — global avgpool + FC;
    * nc — number of classes.

    precision="bf16w" serves every segment at the bf16 weight-storage
    tier; precision="int8" expects QUANTIZED params (quantize_resnet50
    output) and runs the int8 kernels."""
    from winograd_tpu.config import (
        BlockConfig,
        TransitionConfig,
        case_flops,
        stem_entry_flops,
    )
    from winograd_tpu.models.downsample import (
        downsample_bottleneck_block_pallas,
        projection_bottleneck_block_pallas,
        resnet50_stages,
    )
    from winograd_tpu.models.resnet50 import head_pallas, stem_pallas

    assert img_hw % 4 == 0, img_hw  # 7x7/2 conv + 3x3/2 maxpool
    hw = img_hw // 4
    int8 = precision == "int8"
    wr_key, we_key = ("w_reduce_q", "w_expand_q") if int8 else (
        "w_reduce", "w_expand")
    stem_c, c_mid0 = params["proj"][wr_key].shape
    c_io0 = params["proj"][we_key].shape[1]

    if int8:
        from winograd_tpu.kernels.quantized import (
            resnet_stage_int8_pallas,
            transition_block_int8_pallas,
        )
        from winograd_tpu.models.resnet50 import (
            _head_int8,
            _projection_block_int8,
        )

        def stem_proj(a, prm):
            return _projection_block_int8(
                stem_pallas(a, prm["stem"], "int8"), prm["proj"]
            )

        def run_builder(si, bi, bj):
            def run(a, prm):
                sliced = jax.tree.map(
                    lambda v: v[bi:bj + 1], prm["stages"][si]["blocks"]
                )
                return resnet_stage_int8_pallas(a, sliced)

            return run

        def head_fn(a, prm):
            return _head_int8(a, prm["head"])
    else:

        def stem_proj(a, prm):
            return projection_bottleneck_block_pallas(
                stem_pallas(a, prm["stem"], precision), prm["proj"], precision
            )

        def run_builder(si, bi, bj):
            def run(a, prm):
                return resnet50_stages(
                    a,
                    [{"transition": None,
                      "blocks": prm["stages"][si]["blocks"][bi:bj + 1]}],
                    precision=precision,
                )

            return run

        def head_fn(a, prm):
            return head_pallas(a, prm["head"], precision)

    segs = [(
        stem_proj,
        stem_entry_flops(img_hw, stem_c, c_mid0, c_io0),
        (hw, hw, c_io0),
        ("stem",),
    )]
    for si, st in enumerate(params["stages"]):
        if st.get("transition") is not None:
            c_in, c_mid = st["transition"][wr_key].shape
            c_out = st["transition"][we_key].shape[1]

            if int8:

                def tr(a, prm, si=si):
                    return transition_block_int8_pallas(
                        a, prm["stages"][si]["transition"]
                    )
            else:

                def tr(a, prm, si=si):
                    return downsample_bottleneck_block_pallas(
                        a, prm["stages"][si]["transition"], precision=precision
                    )

            ho = -(-hw // 2)  # ceil: the kernels SAME-pad odd maps
            segs.append((
                tr,
                case_flops(TransitionConfig("t", c_in, c_mid, c_out, hw=hw)),
                (ho, ho, c_out),
                ("tr", si),
            ))
            hw = ho
        # Identity blocks. int8 stages are STACKED on a leading block axis
        # (quantize_stage_params); one segment = one static slice of it.
        if int8:
            n_blocks = int(st["blocks"][wr_key].shape[0])
        else:
            n_blocks = len(st["blocks"])
        for bi in range(n_blocks):
            if int8:
                c_io, c_mid = st["blocks"][wr_key].shape[1:]
            else:
                c_io, c_mid = st["blocks"][bi]["w_reduce"].shape
            # Block segments carry no standalone fn: the group builder
            # always executes identity runs through run_builder so blocks
            # landing on one rank coalesce into one stage-kernel call.
            segs.append((
                None,
                case_flops(BlockConfig("b", c_io=c_io, c_mid=c_mid, hw=hw)),
                (hw, hw, c_io),
                ("blk", si, bi),
            ))

    nc = params["head"]["w_fc_q" if int8 else "w_fc"].shape[1]
    return segs, run_builder, head_fn, nc


def _balanced_partition(costs, k: int):
    """Split costs into k contiguous NON-EMPTY groups minimizing the max
    group sum (the pipeline's steady-state bottleneck). O(n^2 k) DP — n is
    tens of blocks. Requires len(costs) >= k (every rank gets at least one
    segment — an empty group would idle a device even on a cost tie).
    Returns group boundary indices: groups[i] = [b[i], b[i+1])."""
    n = len(costs)
    assert n >= k >= 1, (n, k)
    prefix = [0]
    for c in costs:
        prefix.append(prefix[-1] + c)
    INF = float("inf")
    # best[j][i]: minimal max-group-sum splitting the first i items into j
    # non-empty groups (valid only for i >= j).
    best = [[INF] * (n + 1) for _ in range(k + 1)]
    cut = [[0] * (n + 1) for _ in range(k + 1)]
    best[0][0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n + 1):
            for p in range(j - 1, i):
                v = max(best[j - 1][p], prefix[i] - prefix[p])
                if v < best[j][i]:
                    best[j][i], cut[j][i] = v, p
    bounds = [n]
    for j in range(k, 0, -1):
        bounds.append(cut[j][bounds[-1]])
    return bounds[::-1]


def pipelined_resnet50_inference(
    mesh: Mesh,
    params: dict,
    x: jax.Array,
    microbatch: int,
    num_classes: Optional[int] = None,
    precision: Optional[str] = None,
) -> jax.Array:
    """The COMPLETE classifier as a HETEROGENEOUS GPipe pipeline over any
    pipe-mesh size: segments (stem+entry, transitions, residual blocks,
    head) are partitioned at block granularity into contiguous rank groups
    balanced by nominal FLOPs — a named-stage split would bottleneck on
    conv4_x for the deeper family (ResNet-152's conv4_x is ~60% of the
    model), while the balanced split keeps every rank busy.

    Unlike pipelined_stage_inference (uniform block stages), the
    classifier's segments change resolution and width, so inter-rank
    activations travel as FLAT buffers padded to the largest boundary
    and each rank reshapes statically; rank dispatch is a lax.switch on
    the pipe index. Parameters are replicated (heterogeneous pytrees
    cannot stack over the pipe axis) — this pipeline is the
    activation-streaming / throughput-scaling schedule, not a weight-
    memory partitioning (that's tensor_parallel.py's job).

    params: the models/resnet50.py forward structure (any trunk depth);
    for precision="int8" pass quantize_resnet50(params) instead (the int8
    kernels run per segment; stem stays f32 as in single-device serving).
    x: (N, H, W, 3) with N % microbatch == 0."""
    segs, run_builder, head_fn, nc = _classifier_segments(
        params, x.shape[1], precision
    )
    return _pipelined_classifier(
        mesh, params, x, microbatch, num_classes or nc, precision,
        segs, run_builder, head_fn, "r50",
    )


def pipelined_basicnet_inference(
    mesh: Mesh,
    params: dict,
    x: jax.Array,
    microbatch: int,
    num_classes: Optional[int] = None,
    precision: Optional[str] = None,
) -> jax.Array:
    """The COMPLETE BASIC-block classifier (ResNet-18/34) as the same
    heterogeneous block-granular GPipe pipeline (see
    pipelined_resnet50_inference): segments are [stem], each stride-2
    entry block, each identity block, partitioned into contiguous rank
    groups by the FLOP-balancing DP; contiguous identity runs landing on
    one rank coalesce (and a WHOLE small-map stage carrying the offline
    "fused" artifact runs the weight-streaming basic-stage kernel, exactly
    as single-device serving routes it).

    params: the models/basic.py forward structure; for precision="int8"
    pass quantize_basicnet(params). x: (N, H, W, 3), N % microbatch == 0."""
    segs, run_builder, head_fn, nc = _basicnet_segments(
        params, x.shape[1], precision
    )
    return _pipelined_classifier(
        mesh, params, x, microbatch, num_classes or nc, precision,
        segs, run_builder, head_fn, "basic",
    )


def _basicnet_segments(params, img_hw: int, precision=None):
    """Pipeline-segment decomposition of the BASIC-block classifier —
    the models/basic.py twin of _classifier_segments. Returns
    (segs, run_builder, head_fn, nc); segs carry
    meta ("stem",) / ("tr", si) [the stride-2 entry block] / ("blk", si, bi)
    with nominal FLOPs and static boundary shapes derived from weight
    shapes (no tracing)."""
    from winograd_tpu.models.basic import basicnet_stages
    from winograd_tpu.models.resnet50 import head_pallas, stem_pallas

    assert img_hw % 4 == 0, img_hw
    hw = img_hw // 4
    int8 = precision == "int8"
    stem_c = params["stem"]["s_stem"].shape[0]

    if int8:
        from winograd_tpu.models.basic import (
            basic_block_int8,
            downsample_basic_block_int8,
        )
        from winograd_tpu.models.resnet50 import _head_int8

        def stem_seg(a, prm):
            return stem_pallas(a, prm["stem"], "int8")

        def entry_builder(si):
            def entry(a, prm, si=si):
                return downsample_basic_block_int8(
                    a, prm["stages"][si]["entry"]
                )

            return entry

        def run_builder(si, bi, bj):
            def run(a, prm):
                st = prm["stages"][si]
                fused = st.get("fused")
                if (
                    fused is not None
                    and bi == 0
                    and bj == len(st["blocks"]) - 1
                    and 0 < a.shape[-2] * a.shape[-3] <= 8 * 8
                ):
                    from winograd_tpu.kernels.basic_stage import (
                        basic_stage_int8_pallas,
                    )

                    return basic_stage_int8_pallas(a, fused)
                for b in st["blocks"][bi:bj + 1]:
                    a = basic_block_int8(a, b)
                return a

            return run

        def head_fn(a, prm):
            return _head_int8(a, prm["head"])

        nc = params["head"]["w_fc_q"].shape[1]
    else:

        def stem_seg(a, prm):
            return stem_pallas(a, prm["stem"], precision)

        def entry_builder(si):
            def entry(a, prm, si=si):
                from winograd_tpu.models.basic import (
                    downsample_basic_block_pallas,
                )

                return downsample_basic_block_pallas(
                    a, prm["stages"][si]["entry"], precision
                )

            return entry

        def run_builder(si, bi, bj):
            def run(a, prm):
                st = prm["stages"][si]
                sub = {"blocks": st["blocks"][bi:bj + 1]}
                if "fused" in st and bi == 0 and bj == len(st["blocks"]) - 1:
                    sub["fused"] = st["fused"]
                return basicnet_stages(a, [sub], precision)

            return run

        def head_fn(a, prm):
            return head_pallas(a, prm["head"], precision)

        nc = params["head"]["w_fc"].shape[1]

    hs = img_hw // 2
    segs = [(
        stem_seg,
        2 * hs * hs * 49 * 3 * stem_c,
        (hw, hw, stem_c),
        ("stem",),
    )]
    prev = stem_c
    for si, st in enumerate(params["stages"]):
        if st.get("entry") is not None:
            c = st["entry"]["s_b"].shape[0]
            hw = -(-hw // 2)
            segs.append((
                entry_builder(si),
                2 * hw * hw * (9 * prev * c + 9 * c * c + prev * c),
                (hw, hw, c),
                ("tr", si),
            ))
            prev = c
        for bi in range(len(st["blocks"])):
            c = prev
            segs.append((
                None,
                2 * hw * hw * 2 * 9 * c * c,
                (hw, hw, c),
                ("blk", si, bi),
            ))
    return segs, run_builder, head_fn, nc


def _pipelined_classifier(
    mesh: Mesh,
    params: dict,
    x: jax.Array,
    microbatch: int,
    nc: int,
    precision,
    segs,
    run_builder,
    head_fn,
    cache_tag: str,
) -> jax.Array:
    """Generic heterogeneous block-granular GPipe driver shared by the
    bottleneck and basic families: FLOP-balanced contiguous rank groups,
    flat padded inter-rank buffers, lax.switch rank dispatch, replicated
    params, memoized jitted program."""
    n_stages = mesh.shape["pipe"]
    n, h, w, c = x.shape
    assert n % microbatch == 0, (n, microbatch)
    m = n // microbatch
    mb = microbatch
    assert n_stages <= len(segs), (
        f"{n_stages}-rank pipe needs >= {n_stages} segments, model has "
        f"{len(segs)}"
    )
    bounds = _balanced_partition([s[1] for s in segs], n_stages)

    def make_group(i0, i1, with_head):
        # Coalesce contiguous identity-block runs of the same stage back
        # into ONE fused stage-kernel call: the partition is block-granular
        # but execution shouldn't pay per-block HBM round trips for blocks
        # that landed on the same rank.
        plan = []
        j = i0
        while j < i1:
            meta = segs[j][3]
            if meta[0] == "blk":
                si, bi = meta[1], meta[2]
                k = j
                while (
                    k + 1 < i1
                    and segs[k + 1][3][0] == "blk"
                    and segs[k + 1][3][1] == si
                ):
                    k += 1
                plan.append(run_builder(si, bi, segs[k][3][2]))
                j = k + 1
            else:
                plan.append(segs[j][0])
                j += 1

        def group(a, prm):
            for f in plan:
                a = f(a, prm)
            return head_fn(a, prm) if with_head else a

        return group

    fns = [
        make_group(bounds[i], bounds[i + 1], with_head=(i == n_stages - 1))
        for i in range(n_stages)
    ]
    # Static boundary shapes, analytically from the segment decomposition
    # (tracing eval_shape probes here would re-trace the whole classifier
    # on every call just to build the memo key).
    in_shapes = [(mb, h, w, c)] + [
        (mb, *segs[bounds[i + 1] - 1][2]) for i in range(n_stages - 1)
    ]
    flat = [int(np.prod(s[1:])) for s in in_shapes]
    maxf = max(max(flat), nc)

    def make_branch(i):
        def branch(buf, prm):
            a = buf[:, : flat[i]].reshape(in_shapes[i])
            y = fns[i](a, prm).reshape(mb, -1)
            return jnp.pad(y, ((0, 0), (0, maxf - y.shape[1])))

        return branch

    branches = [make_branch(i) for i in range(n_stages)]

    # Params travel as a TRACED, replicated operand — closing over the
    # full classifier's ~100 MB of weights would bake them into the HLO as
    # constants. The jitted program is memoized per (mesh, geometry, param
    # structure) so steady-state calls skip retracing.
    def local_fn(xm_l, prm):
        stage = jax.lax.axis_index("pipe")
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(carry, t):
            buf, outs = carry
            x_in = xm_l[jnp.minimum(t, m - 1)].reshape(mb, -1)
            x_in = jnp.pad(x_in, ((0, 0), (0, maxf - x_in.shape[1])))
            cur = jnp.where(stage == 0, x_in, buf)
            active = jnp.logical_and(t >= stage, t - stage < m)
            y = jax.lax.cond(
                active,
                lambda b: jax.lax.switch(stage, branches, b, prm),
                lambda b: b,
                cur,
            )
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            outs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_slice(
                    o, y[None, :, :nc], (jnp.maximum(out_idx, 0), 0, 0)
                ),
                lambda o: o,
                outs,
            )
            buf = jax.lax.ppermute(y, "pipe", perm)
            return (buf, outs), None

        buf0 = jnp.zeros((mb, maxf), jnp.float32)
        outs0 = jnp.zeros((m, mb, nc), jnp.float32)
        (_, outs), _ = jax.lax.scan(
            step, (buf0, outs0), jnp.arange(m + n_stages - 1)
        )
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), "pipe"
        )

    key = (
        cache_tag,
        mesh,
        (n, h, w, c),
        mb,
        nc,
        precision,
        tuple(bounds),
        tuple(flat),
        jax.tree_util.tree_structure(params),
    )
    fn = _R50_PIPE_CACHE.get(key)
    if fn is None:
        p_spec = jax.tree.map(lambda _: P(), params)
        fn = _R50_PIPE_CACHE[key] = jax.jit(
            shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(P(), p_spec),
                out_specs=P(),
                check_vma=False,
            )
        )
    out = fn(x.reshape(m, mb, h, w, c), params)
    return out.reshape(n, nc)

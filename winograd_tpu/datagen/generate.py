"""Data/parameter generator — the reference's L0 layer, rebuilt.

Reproduces the artifact contract of /root/reference/data_generator.py —
random NHWC inputs, 3x3 OIHW weights with the OFFLINE Winograd filter
transform (G g G^T, written position-major as [36][Cin][Cout],
data_generator.py:63-78), raw BN parameters AND offline-folded scale/bias
(data_generator.py:41-47,107-113), 1x1 weights in [Cin][Cout] layout — as
raw little-endian float32 .bin files, plus three deliberate upgrades
(SURVEY.md §3.4, §4):

* Seed control (the reference has none).
* Every case gets its own complete file set — the reference's default
  __main__ omits the 256-channel Winograd files and aliases all four 1x1
  cases onto the same 1024-channel blobs (README.md:29 "[BUGGY NUMBERS]").
* float64-accumulated GOLDEN OUTPUTS are emitted next to the inputs, so
  correctness is checked against an independent oracle rather than only
  vendor-vs-custom (the reference's check would pass if both shared a bug).

All cases are also constructible in memory (make_*_case) — the bench and
tests use that path; the .bin files exist for the artifact contract.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from winograd_tpu.config import (
    BN_EPS,
    CASES,
    BackboneConfig,
    BlockConfig,
    LayerConfig,
    TransitionConfig,
)
from winograd_tpu.kernels import transforms
from winograd_tpu.ops import reference
from winograd_tpu.utils.io import save_parameter


def _rand(rng: np.random.Generator, *shape, scale: float = 1.0) -> np.ndarray:
    return ((rng.random(shape) - 0.5) * scale).astype(np.float32)


def _bn_params(rng: np.random.Generator, channels: int, scale: float = 1.0):
    gamma = _rand(rng, channels, scale=scale)
    beta = _rand(rng, channels, scale=scale)
    mean = _rand(rng, channels, scale=scale)
    # Variance offset keeps sqrt well-conditioned (reference uses *3+5 / *20+5).
    var = (rng.random(channels) * 3 + 5).astype(np.float32)
    s, b = transforms.fold_batchnorm(gamma, beta, mean, var, eps=BN_EPS)
    return dict(gamma=gamma, beta=beta, mean=mean, var=var, scale=s, bias=b)


def make_winograd_case(cfg: LayerConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """3x3 case: input, OIHW weights, offline artifacts for BOTH conv
    algorithms (Winograd U and im2col W9), folded BN, golden."""
    from winograd_tpu.kernels.direct import direct_filter

    rng = np.random.default_rng(seed)
    x = _rand(rng, cfg.hw, cfg.hw, cfg.cin)
    w = _rand(rng, cfg.cout, cfg.cin, 3, 3)
    bn = _bn_params(rng, cfg.cout)
    u = transforms.transform_filter(w)            # F(4,3), reference layout
    u2 = transforms.transform_filter(w, m=2)      # F(2,3), the fast algebra
    w9 = np.asarray(direct_filter(w))
    golden = reference.conv3x3_bn_relu(x, w, bn["scale"], bn["bias"], relu=cfg.relu)
    return dict(x=x, w=w, u=u, u2=u2, w9=w9, golden=golden, **bn)


def make_pointwise_case(cfg: LayerConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """1x1 case: input, (Cin, Cout) weights, folded BN, golden."""
    rng = np.random.default_rng(seed)
    x = _rand(rng, cfg.hw, cfg.hw, cfg.cin)
    w = _rand(rng, cfg.cin, cfg.cout)
    bn = _bn_params(rng, cfg.cout)
    golden = reference.conv1x1_bn(x, w, bn["scale"], bn["bias"], relu=cfg.relu)
    return dict(x=x, w=w, golden=golden, **bn)


def make_block_case(cfg: BlockConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """Bottleneck block(s): params for each block's three convs, composed
    golden. For cfg.blocks > 1 (a full ResNet stage), block i's params are
    prefixed "bi_"; block 0 keeps unprefixed names for compatibility."""
    from winograd_tpu.kernels.direct import direct_filter

    rng = np.random.default_rng(seed)
    # BN scale magnitudes are damped for deep stacks so activations stay
    # O(1) through cfg.blocks chained blocks.
    bn_scale = 1.0 if cfg.blocks == 1 else 0.5
    shape = (cfg.hw, cfg.hw, cfg.c_io) if cfg.batch == 1 else (cfg.batch, cfg.hw, cfg.hw, cfg.c_io)
    x = _rand(rng, *shape)
    case: Dict[str, np.ndarray] = dict(x=x)
    h = x
    for i in range(cfg.blocks):
        w_reduce = _rand(rng, cfg.c_io, cfg.c_mid)
        bn1 = _bn_params(rng, cfg.c_mid, scale=bn_scale)
        w_mid = _rand(rng, cfg.c_mid, cfg.c_mid, 3, 3)
        bn2 = _bn_params(rng, cfg.c_mid, scale=bn_scale)
        w_expand = _rand(rng, cfg.c_mid, cfg.c_io)
        bn3 = _bn_params(rng, cfg.c_io, scale=bn_scale)
        h = reference.bottleneck_block(
            h,
            w_reduce, bn1["scale"], bn1["bias"],
            w_mid, bn2["scale"], bn2["bias"],
            w_expand, bn3["scale"], bn3["bias"],
        )
        prefix = "" if i == 0 else f"b{i}_"
        case.update({
            f"{prefix}w_reduce": w_reduce,
            f"{prefix}s_reduce": bn1["scale"], f"{prefix}b_reduce": bn1["bias"],
            f"{prefix}w_mid": w_mid,
            f"{prefix}u_mid": transforms.transform_filter(w_mid),
            f"{prefix}u2_mid": transforms.transform_filter(w_mid, m=2),
            f"{prefix}w9_mid": np.asarray(direct_filter(w_mid)),
            f"{prefix}s_mid": bn2["scale"], f"{prefix}b_mid": bn2["bias"],
            f"{prefix}w_expand": w_expand,
            f"{prefix}s_expand": bn3["scale"], f"{prefix}b_expand": bn3["bias"],
        })
    case["golden"] = h
    return case


def make_transition_case(cfg: TransitionConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """Stride-2 transition block: all four convs' params (w9_mid in the
    direct im2col layout for the fused kernel) + composed float64 golden."""
    from winograd_tpu.kernels.direct import direct_filter

    rng = np.random.default_rng(seed)
    shape = (
        (cfg.hw, cfg.hw, cfg.c_in)
        if cfg.batch == 1
        else (cfg.batch, cfg.hw, cfg.hw, cfg.c_in)
    )
    x = _rand(rng, *shape)
    w_mid = _rand(rng, cfg.c_mid, cfg.c_mid, 3, 3)
    bn1 = _bn_params(rng, cfg.c_mid)
    bn2 = _bn_params(rng, cfg.c_mid)
    bn3 = _bn_params(rng, cfg.c_out)
    bnp = _bn_params(rng, cfg.c_out)
    case = dict(
        x=x,
        w_reduce=_rand(rng, cfg.c_in, cfg.c_mid),
        s_reduce=bn1["scale"], b_reduce=bn1["bias"],
        w_mid=w_mid, w9_mid=np.asarray(direct_filter(w_mid)),
        s_mid=bn2["scale"], b_mid=bn2["bias"],
        w_expand=_rand(rng, cfg.c_mid, cfg.c_out),
        s_expand=bn3["scale"], b_expand=bn3["bias"],
        w_proj=_rand(rng, cfg.c_in, cfg.c_out),
        s_proj=bnp["scale"], b_proj=bnp["bias"],
    )
    case["golden"] = reference.downsample_bottleneck_block(
        x,
        case["w_reduce"], case["s_reduce"], case["b_reduce"],
        w_mid, case["s_mid"], case["b_mid"],
        case["w_expand"], case["s_expand"], case["b_expand"],
        case["w_proj"], case["s_proj"], case["b_proj"],
    )
    return case


_TRANSITION_KEYS = (
    "w_reduce", "s_reduce", "b_reduce", "w_mid", "w9_mid", "s_mid", "b_mid",
    "w_expand", "s_expand", "b_expand", "w_proj", "s_proj", "b_proj",
)


def transition_params(case: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k: case[k] for k in _TRANSITION_KEYS}


_BLOCK_KEYS = (
    "w_reduce", "s_reduce", "b_reduce", "w_mid", "u_mid", "u2_mid", "w9_mid",
    "s_mid", "b_mid", "w_expand", "s_expand", "b_expand",
)


def block_params_list(cfg: BlockConfig, case: Dict[str, np.ndarray]):
    """Extract the per-block param dicts from a make_block_case dict."""
    out = []
    for i in range(cfg.blocks):
        prefix = "" if i == 0 else f"b{i}_"
        out.append({k: case[f"{prefix}{k}"] for k in _BLOCK_KEYS if f"{prefix}{k}" in case})
    return out


def make_backbone_case(cfg: BackboneConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """Full conv3_x -> conv4_x -> conv5_x backbone: per-stage identity
    blocks + stride-2 transitions, float64 golden chained through the
    reference ops. Keys are flat ("s{i}_" stage prefix, "t{i}_" transition
    prefix) so the case round-trips through one .npz; backbone_stages()
    rebuilds the nested structure models/downsample.py consumes."""
    rng = np.random.default_rng(seed)
    case: Dict[str, np.ndarray] = {}
    first = cfg.stages[0]
    shape = (
        (first[2], first[2], first[0])
        if cfg.batch == 1
        else (cfg.batch, first[2], first[2], first[0])
    )
    x = _rand(rng, *shape)
    case["x"] = x
    h = x.astype(np.float64)
    prev = None
    for si, (c_io, c_mid, hw, blocks) in enumerate(cfg.stages):
        if prev is not None:
            tcfg = TransitionConfig("t", prev, c_mid, c_io, hw=2 * hw)
            tcase = _transition_params_random(rng, tcfg, bn_scale=0.5)
            h = reference.downsample_bottleneck_block(
                h,
                tcase["w_reduce"], tcase["s_reduce"], tcase["b_reduce"],
                tcase["w_mid"], tcase["s_mid"], tcase["b_mid"],
                tcase["w_expand"], tcase["s_expand"], tcase["b_expand"],
                tcase["w_proj"], tcase["s_proj"], tcase["b_proj"],
            )
            case.update({f"t{si}_{k}": v for k, v in tcase.items()})
        for bi in range(blocks):
            b = _block_params_random(rng, c_io, c_mid, bn_scale=0.5)
            h = reference.bottleneck_block(
                h,
                b["w_reduce"], b["s_reduce"], b["b_reduce"],
                b["w_mid"], b["s_mid"], b["b_mid"],
                b["w_expand"], b["s_expand"], b["b_expand"],
            )
            case.update({f"s{si}_b{bi}_{k}": v for k, v in b.items()})
        prev = c_io
    case["golden"] = np.asarray(h, np.float32)
    return case


def _block_params_random(rng, c_io, c_mid, bn_scale=1.0) -> Dict[str, np.ndarray]:
    from winograd_tpu.kernels.direct import direct_filter

    w_mid = _rand(rng, c_mid, c_mid, 3, 3)
    bn1 = _bn_params(rng, c_mid, scale=bn_scale)
    bn2 = _bn_params(rng, c_mid, scale=bn_scale)
    bn3 = _bn_params(rng, c_io, scale=bn_scale)
    return dict(
        w_reduce=_rand(rng, c_io, c_mid), s_reduce=bn1["scale"], b_reduce=bn1["bias"],
        w_mid=w_mid, u_mid=transforms.transform_filter(w_mid),
        u2_mid=transforms.transform_filter(w_mid, m=2),
        w9_mid=np.asarray(direct_filter(w_mid)),
        s_mid=bn2["scale"], b_mid=bn2["bias"],
        w_expand=_rand(rng, c_mid, c_io), s_expand=bn3["scale"], b_expand=bn3["bias"],
    )


def _transition_params_random(rng, tcfg: TransitionConfig, bn_scale=1.0) -> Dict[str, np.ndarray]:
    from winograd_tpu.kernels.direct import direct_filter

    w_mid = _rand(rng, tcfg.c_mid, tcfg.c_mid, 3, 3)
    bn1 = _bn_params(rng, tcfg.c_mid, scale=bn_scale)
    bn2 = _bn_params(rng, tcfg.c_mid, scale=bn_scale)
    bn3 = _bn_params(rng, tcfg.c_out, scale=bn_scale)
    bnp = _bn_params(rng, tcfg.c_out, scale=bn_scale)
    return dict(
        w_reduce=_rand(rng, tcfg.c_in, tcfg.c_mid),
        s_reduce=bn1["scale"], b_reduce=bn1["bias"],
        w_mid=w_mid, w9_mid=np.asarray(direct_filter(w_mid)),
        s_mid=bn2["scale"], b_mid=bn2["bias"],
        w_expand=_rand(rng, tcfg.c_mid, tcfg.c_out),
        s_expand=bn3["scale"], b_expand=bn3["bias"],
        w_proj=_rand(rng, tcfg.c_in, tcfg.c_out),
        s_proj=bnp["scale"], b_proj=bnp["bias"],
    )


def make_resnet50_case(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """The COMPLETE ResNet-50 case: image input, stem params (raw OIHW 7x7
    filter AND its im2col GEMM layout), conv2_x's stride-1 projection entry
    block ("p0_" prefix), the 16-block trunk (same "s{i}_"/"t{i}_" naming as
    make_backbone_case), head FC params, and the float64 golden — both the
    trunk feature map (golden_trunk, for diagnostics) and the final logits
    (golden, what the bench checks)."""
    from winograd_tpu.models.resnet50 import stem_filter, stem_filter_s2d

    rng = np.random.default_rng(seed)
    case: Dict[str, np.ndarray] = {}
    img, stem_c = cfg.img, cfg.stem_c
    shape = (
        (img, img, 3) if cfg.batch == 1 else (cfg.batch, img, img, 3)
    )
    x = _rand(rng, *shape)
    case["x"] = x

    # Stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool. Both offline GEMM
    # layouts ship as artifacts (the offline-transform contract): the
    # im2col form (stem_w49) and the served space-to-depth form (stem_w192).
    w7 = _rand(rng, stem_c, 3, 7, 7)
    bn_stem = _bn_params(rng, stem_c, scale=0.5)
    case.update(
        stem_w7=w7, stem_w49=stem_filter(w7), stem_w192=stem_filter_s2d(w7),
        stem_scale=bn_stem["scale"], stem_bias=bn_stem["bias"],
    )
    h = reference.stem(x.astype(np.float64), w7, bn_stem["scale"], bn_stem["bias"])

    # conv2_x entry: stride-1 projection block stem_c -> c_io0.
    c_io0, c_mid0 = cfg.stages[0][0], cfg.stages[0][1]
    pcfg = TransitionConfig("p0", stem_c, c_mid0, c_io0, hw=cfg.stages[0][2])
    p0 = _transition_params_random(rng, pcfg, bn_scale=0.5)
    p0["u2_mid"] = transforms.transform_filter(p0["w_mid"], m=2)
    h = reference.downsample_bottleneck_block(
        h,
        p0["w_reduce"], p0["s_reduce"], p0["b_reduce"],
        p0["w_mid"], p0["s_mid"], p0["b_mid"],
        p0["w_expand"], p0["s_expand"], p0["b_expand"],
        p0["w_proj"], p0["s_proj"], p0["b_proj"],
        stride=1,
    )
    case.update({f"p0_{k}": v for k, v in p0.items()})

    # The 16-block trunk (identical structure to make_backbone_case).
    prev = None
    for si, (c_io, c_mid, hw, blocks) in enumerate(cfg.stages):
        if prev is not None:
            tcfg = TransitionConfig("t", prev, c_mid, c_io, hw=2 * hw)
            tcase = _transition_params_random(rng, tcfg, bn_scale=0.5)
            h = reference.downsample_bottleneck_block(
                h,
                tcase["w_reduce"], tcase["s_reduce"], tcase["b_reduce"],
                tcase["w_mid"], tcase["s_mid"], tcase["b_mid"],
                tcase["w_expand"], tcase["s_expand"], tcase["b_expand"],
                tcase["w_proj"], tcase["s_proj"], tcase["b_proj"],
            )
            case.update({f"t{si}_{k}": v for k, v in tcase.items()})
        for bi in range(blocks):
            b = _block_params_random(rng, c_io, c_mid, bn_scale=0.5)
            h = reference.bottleneck_block(
                h,
                b["w_reduce"], b["s_reduce"], b["b_reduce"],
                b["w_mid"], b["s_mid"], b["b_mid"],
                b["w_expand"], b["s_expand"], b["b_expand"],
            )
            case.update({f"s{si}_b{bi}_{k}": v for k, v in b.items()})
        prev = c_io
    case["golden_trunk"] = np.asarray(h, np.float32)

    # Head: global avgpool + FC. FC weights are He-scaled (~sqrt(2/C)) so
    # the 2048-term logit sum keeps abs errors inside the strict 1e-4 bar.
    nc = cfg.num_classes
    w_fc = _rand(rng, cfg.stages[-1][0], nc, scale=2 * np.sqrt(2.0 / cfg.stages[-1][0]))
    b_fc = _rand(rng, nc)
    case.update(head_wfc=w_fc, head_bfc=b_fc)
    case["golden"] = np.asarray(reference.head(h, w_fc, b_fc), np.float32)
    return case


def backbone_stages(cfg: BackboneConfig, case: Dict[str, np.ndarray]):
    """Rebuild the models/downsample.py::resnet50_stages structure from a
    flat backbone case dict."""
    stages = []
    for si, (_c_io, _c_mid, _hw, blocks) in enumerate(cfg.stages):
        transition = None
        if any(k.startswith(f"t{si}_") for k in case):
            transition = {
                k[len(f"t{si}_"):]: case[k]
                for k in case
                if k.startswith(f"t{si}_")
            }
        blocks_list = []
        for bi in range(blocks):
            prefix = f"s{si}_b{bi}_"
            blocks_list.append(
                {k[len(prefix):]: case[k] for k in case if k.startswith(prefix)}
            )
        stages.append({"transition": transition, "blocks": blocks_list})
    return stages


def _basic_block_params_random(rng, c, bn_scale=1.0) -> Dict[str, np.ndarray]:
    """Identity BASIC block (two stride-1 3x3s at width c) with both
    offline filter layouts per conv (F(2,3) u2_* and direct w9_*)."""
    from winograd_tpu.kernels.direct import direct_filter

    out: Dict[str, np.ndarray] = {}
    for leg in ("a", "b"):
        w = _rand(rng, c, c, 3, 3)
        bn = _bn_params(rng, c, scale=bn_scale)
        out.update({
            f"w_{leg}": w,
            f"u2_{leg}": transforms.transform_filter(w, m=2),
            f"w9_{leg}": np.asarray(direct_filter(w)),
            f"s_{leg}": bn["scale"], f"b_{leg}": bn["bias"],
        })
    return out


def _basic_entry_params_random(rng, cin, cout, bn_scale=1.0) -> Dict[str, np.ndarray]:
    """Stride-2 entry BASIC block: strided 3x3 cin->cout (direct layout
    only — Winograd needs stride 1), stride-1 3x3 cout->cout, and the
    stride-2 1x1 projection shortcut."""
    from winograd_tpu.kernels.direct import direct_filter

    w_a = _rand(rng, cout, cin, 3, 3)
    bn_a = _bn_params(rng, cout, scale=bn_scale)
    w_b = _rand(rng, cout, cout, 3, 3)
    bn_b = _bn_params(rng, cout, scale=bn_scale)
    bn_p = _bn_params(rng, cout, scale=bn_scale)
    return dict(
        w_a=w_a, w9_a=np.asarray(direct_filter(w_a)),
        s_a=bn_a["scale"], b_a=bn_a["bias"],
        w_b=w_b, u2_b=transforms.transform_filter(w_b, m=2),
        w9_b=np.asarray(direct_filter(w_b)),
        s_b=bn_b["scale"], b_b=bn_b["bias"],
        w_proj=_rand(rng, cin, cout),
        s_proj=bn_p["scale"], b_proj=bn_p["bias"],
    )


def make_basicnet_case(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """The COMPLETE ResNet-18/34 case (BasicNetConfig): image input, stem
    params, the basic-block trunk (stride-2 entry blocks "t{si}_", identity
    blocks "s{si}_b{bi}_"), head FC params, and the float64 golden logits."""
    from winograd_tpu.models.resnet50 import stem_filter, stem_filter_s2d

    rng = np.random.default_rng(seed)
    case: Dict[str, np.ndarray] = {}
    img, stem_c = cfg.img, cfg.stem_c
    shape = (img, img, 3) if cfg.batch == 1 else (cfg.batch, img, img, 3)
    x = _rand(rng, *shape)
    case["x"] = x

    w7 = _rand(rng, stem_c, 3, 7, 7)
    bn_stem = _bn_params(rng, stem_c, scale=0.5)
    case.update(
        stem_w7=w7, stem_w49=stem_filter(w7), stem_w192=stem_filter_s2d(w7),
        stem_scale=bn_stem["scale"], stem_bias=bn_stem["bias"],
    )
    h = reference.stem(x.astype(np.float64), w7, bn_stem["scale"], bn_stem["bias"])

    prev = stem_c
    for si, (c, _hw, blocks) in enumerate(cfg.stages):
        if prev != c:
            e = _basic_entry_params_random(rng, prev, c, bn_scale=0.5)
            h = reference.downsample_basic_block(
                h,
                e["w_a"], e["s_a"], e["b_a"],
                e["w_b"], e["s_b"], e["b_b"],
                e["w_proj"], e["s_proj"], e["b_proj"],
            )
            case.update({f"t{si}_{k}": v for k, v in e.items()})
            blocks -= 1
        for bi in range(blocks):
            b = _basic_block_params_random(rng, c, bn_scale=0.5)
            h = reference.basic_block(
                h, b["w_a"], b["s_a"], b["b_a"], b["w_b"], b["s_b"], b["b_b"]
            )
            case.update({f"s{si}_b{bi}_{k}": v for k, v in b.items()})
        prev = c
    case["golden_trunk"] = np.asarray(h, np.float32)

    nc = cfg.num_classes
    w_fc = _rand(rng, cfg.stages[-1][0], nc, scale=2 * np.sqrt(2.0 / cfg.stages[-1][0]))
    b_fc = _rand(rng, nc)
    case.update(head_wfc=w_fc, head_bfc=b_fc)
    case["golden"] = np.asarray(reference.head(h, w_fc, b_fc), np.float32)
    return case


def make_stem_case(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """The isolated stem case (mode 22): image input, raw OIHW 7x7 filter
    plus both offline GEMM layouts (im2col stem_w49, space-to-depth
    stem_w192 — the fused kernel's artifact), folded BN, float64 golden."""
    from winograd_tpu.models.resnet50 import stem_filter, stem_filter_s2d

    rng = np.random.default_rng(seed)
    shape = (
        (cfg.img, cfg.img, cfg.cin)
        if cfg.batch == 1
        else (cfg.batch, cfg.img, cfg.img, cfg.cin)
    )
    x = _rand(rng, *shape)
    w7 = _rand(rng, cfg.cout, cfg.cin, 7, 7)
    bn = _bn_params(rng, cfg.cout, scale=0.5)
    golden = np.asarray(
        reference.stem(x.astype(np.float64), w7, bn["scale"], bn["bias"]),
        np.float32,
    )
    return {
        "x": x,
        "stem_w7": w7,
        "stem_w49": stem_filter(w7),
        "stem_w192": stem_filter_s2d(w7),
        "stem_scale": bn["scale"],
        "stem_bias": bn["bias"],
        "golden": golden,
    }


def make_case(mode: int, seed: int = 0) -> Dict[str, np.ndarray]:
    from winograd_tpu.config import ResNet50Config, StemConfig

    cfg = CASES[mode]
    from winograd_tpu.config import BasicNetConfig

    if isinstance(cfg, BasicNetConfig):
        return make_basicnet_case(cfg, seed)
    if isinstance(cfg, StemConfig):
        return make_stem_case(cfg, seed)
    if isinstance(cfg, ResNet50Config):
        return make_resnet50_case(cfg, seed)
    if isinstance(cfg, BackboneConfig):
        return make_backbone_case(cfg, seed)
    if isinstance(cfg, TransitionConfig):
        return make_transition_case(cfg, seed)
    if isinstance(cfg, BlockConfig):
        return make_block_case(cfg, seed)
    if cfg.kind == "winograd3x3":
        return make_winograd_case(cfg, seed)
    return make_pointwise_case(cfg, seed)


def _write_winograd_files(outdir: str, cfg: LayerConfig, case: Dict[str, np.ndarray]):
    c = cfg.cin
    pad_side = cfg.hw + 2
    xp = np.pad(case["x"], ((1, 1), (1, 1), (0, 0)))
    assert xp.shape == (pad_side, pad_side, c)
    save_parameter(f"{outdir}/input_{cfg.hw}_1_{c}.bin", xp)
    save_parameter(f"{outdir}/weight_NCHW_{c}_{cfg.cout}.bin", case["w"])
    save_parameter(f"{outdir}/weight_winograd_{c}_{cfg.cout}.bin", case["u"])
    save_parameter(f"{outdir}/weight_winograd2_{c}_{cfg.cout}.bin", case["u2"])
    for name, key in [
        ("bnScale", "gamma"), ("bnBias", "beta"), ("eMean", "mean"), ("eVar", "var"),
        ("bnScale_winograd", "scale"), ("bnBias_winograd", "bias"),
    ]:
        save_parameter(f"{outdir}/{name}_{cfg.cout}.bin", case[key])
    save_parameter(f"{outdir}/golden_winograd_{c}_{cfg.cout}.bin", case["golden"])


def _write_pointwise_files(outdir: str, cfg: LayerConfig, case: Dict[str, np.ndarray]):
    tag = f"{cfg.cin}_{cfg.cout}"
    save_parameter(f"{outdir}/input_one_{cfg.hw}_{tag}.bin", case["x"])
    save_parameter(f"{outdir}/weight_one_{tag}.bin", case["w"])
    for name, key in [
        ("bnScale_one", "gamma"), ("bnBias_one", "beta"),
        ("eMean_one", "mean"), ("eVar_one", "var"),
        ("bnScale_myKernel_one", "scale"), ("bnBias_myKernel_one", "bias"),
    ]:
        save_parameter(f"{outdir}/{name}_{tag}.bin", case[key])
    save_parameter(f"{outdir}/golden_one_{tag}.bin", case["golden"])


def generate_all(outdir: str = "data", seed: int = 0) -> None:
    os.makedirs(outdir, exist_ok=True)
    from winograd_tpu.config import FullTrainConfig, TrainConfig

    # Record the sweep seed so load_case can regenerate the bench-only
    # cases (batched backbones, train steps) from the SAME seed family as
    # the on-disk artifacts (seed + mode), not just the default seed 0.
    import json

    with open(os.path.join(outdir, "meta.json"), "w") as f:
        json.dump({"seed": seed}, f)

    for mode, cfg in CASES.items():
        if (isinstance(cfg, BackboneConfig) and cfg.batch > 1) or not getattr(
            cfg, "on_disk", True
        ):
            # The batched-backbone cases (modes 14/18) and the deep-variant
            # whole models (modes 20/21, on_disk=False) are bench-only: the
            # float64 golden chains cost minutes and 100s of MB on disk;
            # the bench generates them in memory (same seeded path).
            continue
        if isinstance(cfg, (TrainConfig, FullTrainConfig)):
            # The train-step cases are modes 13/16's data under a different
            # seed; bench-only (load_case regenerates in memory).
            continue
        case = make_case(mode, seed=seed + mode)
        if isinstance(cfg, (BlockConfig, TransitionConfig, BackboneConfig)):
            np.savez(os.path.join(outdir, f"{cfg.name}.npz"), **case)
        elif cfg.kind == "winograd3x3":
            _write_winograd_files(outdir, cfg, case)
        else:
            _write_pointwise_files(outdir, cfg, case)


def load_case(mode: int, data_dir: str) -> Dict[str, np.ndarray]:
    """Load a case from on-disk artifacts (the reference's consumption path:
    kernels read raw blobs by path, e.g. Kernel128_winograd.cu:216-252).
    Returns the same dict structure as make_case."""
    from winograd_tpu.utils.io import get_parameters

    from winograd_tpu.config import FullTrainConfig, TrainConfig

    cfg = CASES[mode]
    if (
        (isinstance(cfg, BackboneConfig) and cfg.batch > 1)
        or isinstance(cfg, (TrainConfig, FullTrainConfig))
        or not getattr(cfg, "on_disk", True)
    ):
        # generate_all deliberately skips these cases ("the bench generates
        # it in memory"); honor that promise here so a `bench all
        # --data-dir` sweep doesn't FileNotFoundError on them. The dir's
        # meta.json records the sweep seed, so the regenerated case comes
        # from the SAME (seed + mode) family as its on-disk siblings.
        base_seed = 0
        meta_path = os.path.join(data_dir, "meta.json")
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                base_seed = json.load(f).get("seed", 0)
        return make_case(mode, seed=base_seed + mode)
    if isinstance(cfg, (BlockConfig, TransitionConfig, BackboneConfig)):
        with np.load(os.path.join(data_dir, f"{cfg.name}.npz")) as z:
            return {k: z[k] for k in z.files}
    d = data_dir
    hw = cfg.hw
    if cfg.kind == "winograd3x3":
        c, co = cfg.cin, cfg.cout
        spec = {
            f"{d}/input_{hw}_1_{c}.bin": (hw + 2) ** 2 * c,
            f"{d}/weight_NCHW_{c}_{co}.bin": co * c * 9,
            f"{d}/weight_winograd_{c}_{co}.bin": 36 * c * co,
            f"{d}/weight_winograd2_{c}_{co}.bin": 16 * c * co,
            f"{d}/bnScale_winograd_{co}.bin": co,
            f"{d}/bnBias_winograd_{co}.bin": co,
            f"{d}/golden_winograd_{c}_{co}.bin": hw * hw * co,
        }
        blobs = get_parameters(spec)
        xp = blobs[f"{d}/input_{hw}_1_{c}.bin"].reshape(hw + 2, hw + 2, c)
        return dict(
            x=np.ascontiguousarray(xp[1 : hw + 1, 1 : hw + 1, :]),
            w=blobs[f"{d}/weight_NCHW_{c}_{co}.bin"].reshape(co, c, 3, 3),
            u=blobs[f"{d}/weight_winograd_{c}_{co}.bin"].reshape(36, c, co),
            u2=blobs[f"{d}/weight_winograd2_{c}_{co}.bin"].reshape(16, c, co),
            scale=blobs[f"{d}/bnScale_winograd_{co}.bin"],
            bias=blobs[f"{d}/bnBias_winograd_{co}.bin"],
            golden=blobs[f"{d}/golden_winograd_{c}_{co}.bin"].reshape(hw, hw, co),
        )
    ci, co = cfg.cin, cfg.cout
    tag = f"{ci}_{co}"
    spec = {
        f"{d}/input_one_{hw}_{tag}.bin": hw * hw * ci,
        f"{d}/weight_one_{tag}.bin": ci * co,
        f"{d}/bnScale_myKernel_one_{tag}.bin": co,
        f"{d}/bnBias_myKernel_one_{tag}.bin": co,
        f"{d}/golden_one_{tag}.bin": hw * hw * co,
    }
    blobs = get_parameters(spec)
    return dict(
        x=blobs[f"{d}/input_one_{hw}_{tag}.bin"].reshape(hw, hw, ci),
        w=blobs[f"{d}/weight_one_{tag}.bin"].reshape(ci, co),
        scale=blobs[f"{d}/bnScale_myKernel_one_{tag}.bin"],
        bias=blobs[f"{d}/bnBias_myKernel_one_{tag}.bin"],
        golden=blobs[f"{d}/golden_one_{tag}.bin"].reshape(hw, hw, co),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Generate winograd_tpu data artifacts.")
    ap.add_argument("--outdir", default="data")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    generate_all(args.outdir, args.seed)
    print(f"artifacts written to {args.outdir}/ (seed {args.seed})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Static configuration registry for the benchmark cases.

The reference's configuration "system" is three tiers of hard-coded
constants (mode selector in /root/reference/Test.c:17-20, data paths in the
four headers, launch geometry at call sites). Here every case is a frozen
dataclass; shapes stay static per case, which is exactly what XLA wants.

Mode numbering matches the reference CLI (/root/reference/Test.c:17-44,
README.md:15-18):
    0: 3x3 Winograd 128->128 + BN + ReLU
    1: 3x3 Winograd 256->256 + BN + ReLU
    2: 1x1 512->128  + BN + ReLU   (bottleneck "in",  kernel_128_1_in)
    3: 1x1 128->512  + BN          (bottleneck "out", kernel_128_1_out — NO ReLU,
                                    /root/reference/Kernel128_one.cu:271-272)
    4: 1x1 1024->256 + BN + ReLU   (kernel_256_1_in)
    5: 1x1 256->1024 + BN          (kernel_256_1_out — NO ReLU,
                                    /root/reference/Kernel256_one.cu:273)
Extensions beyond the reference:
    6: full residual bottleneck block 1024->256->256->1024 + skip (N=1)
    7: batched residual block (data-parallel ready)
    8: ResNet-50 conv4_x stage (6 blocks, one weight-streaming kernel)
    9/10: conv3_x / conv5_x block geometries (28x28 and 7x7)
    11/12: stride-2 stage transitions (fused megakernel)
    13: the 13-block conv3_x->conv4_x->conv5_x backbone
    14: the same backbone at batch 8 (serving-throughput regime)
    15: the COMPLETE 16-block ResNet-50 residual trunk (conv2_x..conv5_x)
    16: the COMPLETE ResNet-50 classifier (stem + trunk + head, 224x224x3
        image -> 1000 logits)
    17: one full training step (fwd+bwd) through the 13-block backbone's
        serving megakernels
    18: the complete classifier at batch 8 (serving-throughput regime)
    19: one full training step (fwd+bwd) through the COMPLETE classifier
        (stem + projection entry + 16-block trunk + head)
    20/21: ResNet-101 / ResNet-152 through the same kernels (deeper
        conv3_x/conv4_x stages; bench-only artifacts)
    22: the classifier stem in isolation (7x7/2 conv + BN + ReLU + 3x3/2
        maxpool — the fused single-kernel route, kernels/stem.py)
    23/24: ResNet-18 / ResNet-34 — the BASIC-block family (two 3x3 convs
        per block, stride-2 entry blocks) through the same fused kernels
        (bench-only artifacts)
    25: ONE ResNet-18 train step (fwd+bwd through the serving kernels vs
        the all-XLA autodiff step — the basic-family twin of mode 19)
    26: ResNet-18 at batch 8 (the basic-family twin of mode 18)
    27/28: ResNet-50 / ResNet-18 at batch 32 — the serving-SCALE regime
        (steady-state images/s + MFU; the reference fixed N=1,
        report.pdf section 1, so batch scaling is the TPU-native
        capability its scope left open; bench-only artifacts)
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class LayerConfig:
    """One fused conv+BN(+ReLU) layer case."""

    name: str
    kind: str  # "winograd3x3" | "pointwise"
    cin: int
    cout: int
    hw: int = 14  # square feature map side
    relu: bool = True
    # Winograd tile algebra F(m x m, r x r); fixed at F(4,3) like the reference.
    tile_m: int = 4
    tile_r: int = 3

    @property
    def tiles_per_side(self) -> int:
        return -(-self.hw // self.tile_m)  # cdiv

    @property
    def num_tiles(self) -> int:
        return self.tiles_per_side ** 2

    @property
    def alpha(self) -> int:
        """Winograd input-tile side (m + r - 1 = 6 for F(4,3))."""
        return self.tile_m + self.tile_r - 1


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """ResNet bottleneck block(s): 1x1 reduce -> 3x3 -> 1x1 expand + skip.

    blocks > 1 chains that many bottlenecks — e.g. 6 is ResNet-50's full
    conv4_x stage, the stage whose layers the reference benchmarks in
    isolation (report.pdf §1)."""

    name: str
    c_io: int = 1024
    c_mid: int = 256
    hw: int = 14
    batch: int = 1
    blocks: int = 1


@dataclasses.dataclass(frozen=True)
class TransitionConfig:
    """Stride-2 downsample (stage-transition) bottleneck block: 1x1 reduce
    -> stride-2 3x3 -> 1x1 expand, with a stride-2 1x1 projection shortcut
    (ResNet v1.5). hw is the INPUT side; output is ceil(hw/2)."""

    name: str
    c_in: int
    c_mid: int
    c_out: int
    hw: int
    batch: int = 1


CASES: Dict[int, object] = {
    0: LayerConfig("winograd3x3_128", "winograd3x3", 128, 128, relu=True),
    1: LayerConfig("winograd3x3_256", "winograd3x3", 256, 256, relu=True),
    2: LayerConfig("pointwise_512_128", "pointwise", 512, 128, relu=True),
    3: LayerConfig("pointwise_128_512", "pointwise", 128, 512, relu=False),
    4: LayerConfig("pointwise_1024_256", "pointwise", 1024, 256, relu=True),
    5: LayerConfig("pointwise_256_1024", "pointwise", 256, 1024, relu=False),
    6: BlockConfig("bottleneck_block", batch=1),
    7: BlockConfig("bottleneck_block_batched", batch=8),
    8: BlockConfig("resnet50_conv4x_stage", batch=1, blocks=6),
    # The other ResNet-50 stage geometries (the reference only covers the
    # 14x14 conv4_x shapes): conv3_x at 28x28 and conv5_x at 7x7.
    9: BlockConfig("resnet50_conv3x_block", c_io=512, c_mid=128, hw=28),
    10: BlockConfig("resnet50_conv5x_block", c_io=2048, c_mid=512, hw=7),
    # Stride-2 stage transitions (fused megakernel, kernels/transition.py).
    11: TransitionConfig("transition_conv3_to_4", 512, 256, 1024, hw=28),
    12: TransitionConfig("transition_conv4_to_5", 1024, 512, 2048, hw=14),
}


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """ResNet-50 conv3_x -> conv4_x -> conv5_x backbone: 13 bottleneck
    blocks across three resolutions (28 -> 14 -> 7) with two stride-2
    transitions — the deepest composed model family here. Stage tuples are
    (c_io, c_mid, hw, identity_blocks); transitions connect them."""

    name: str
    stages = (
        (512, 128, 28, 4),
        (1024, 256, 14, 5),
        (2048, 512, 7, 2),
    )
    batch: int = 1


CASES[13] = BackboneConfig("resnet50_backbone_13")
# Batched serving: the same 13-block backbone at N=8 (throughput regime —
# the megakernel grids batch over images; reference is N=1 only).
CASES[14] = BackboneConfig("resnet50_backbone_13_b8", batch=8)


@dataclasses.dataclass(frozen=True)
class FullTrunkConfig(BackboneConfig):
    """The COMPLETE ResNet-50 residual trunk: conv2_x at 56x56 through
    conv5_x at 7x7 — 16 bottleneck blocks across four resolutions with
    three stride-2 transitions (the stem conv/maxpool and the head are
    outside the reference's scope and ours)."""

    stages = (
        (256, 64, 56, 3),
        (512, 128, 28, 3),
        (1024, 256, 14, 5),
        (2048, 512, 7, 2),
    )


CASES[15] = FullTrunkConfig("resnet50_trunk_16")


@dataclasses.dataclass(frozen=True)
class ResNet50Config(BackboneConfig):
    """The COMPLETE ResNet-50 image classifier: the stem (7x7/2 conv + BN +
    ReLU + 3x3/2 maxpool, 224x224x3 -> 56x56x64), conv2_x's stride-1
    PROJECTION entry block (64 -> 256 at 56x56), the 16-block residual
    trunk, and the head (global avgpool + FC to num_classes logits).

    Unlike FullTrunkConfig (whose conv2_x is 3 identity blocks at a fixed
    256-channel width), stage 0 here is the real conv2_x: a projection
    block plus 2 identity blocks. The reference scopes to single layers of
    one stage (report.pdf section 1); this is the whole deployable model."""

    stages = (
        (256, 64, 56, 2),     # conv2_x: projection entry + 2 identity
        (512, 128, 28, 3),
        (1024, 256, 14, 5),
        (2048, 512, 7, 2),
    )
    img: int = 224
    stem_c: int = 64
    num_classes: int = 1000


CASES[16] = ResNet50Config("resnet50_full")


@dataclasses.dataclass(frozen=True)
class TrainConfig(BackboneConfig):
    """Training benchmark: ONE fwd+bwd step over the 13-block backbone,
    forward through the SAME fused serving megakernels (kernels/vjp.py
    custom VJPs, backward = rematerializing XLA autodiff), measured against
    the all-XLA autodiff step. The reference has no training at all
    (report.pdf section 1: "no training related operations"); modes 0-16
    cover serving — this mode gives the training story its performance
    number."""


CASES[17] = TrainConfig("resnet50_backbone_13_trainstep")

# Batched serving of the WHOLE classifier (mode 16 at N=8) — the
# images/s-under-load regime, like mode 14 is for the 13-block backbone.
CASES[18] = ResNet50Config("resnet50_full_b8", batch=8)


@dataclasses.dataclass(frozen=True)
class FullTrainConfig(ResNet50Config):
    """Training benchmark over the COMPLETE classifier: ONE fwd+bwd step,
    image to logits, forward through the SAME fused kernels serving uses
    (stem s2d GEMM via conv1x1_bn_train with the w7->w192 layout derived
    in-trace, projection/block/transition custom VJPs, head FC) vs the
    all-XLA autodiff step. Mode 17 covers the 13-block backbone; this is
    the whole-model training story."""


CASES[19] = FullTrainConfig("resnet50_full_trainstep")


@dataclasses.dataclass(frozen=True)
class ResNet101Config(ResNet50Config):
    """The COMPLETE ResNet-101 classifier. Same four stage geometries as
    ResNet-50 — only the depths change (conv3_x 4 blocks, conv4_x 23) — so
    the whole serving stack (stem s2d GEMM, projection block, the uniform
    weight-streaming stage megakernels, transitions, head) composes it with
    NO new kernels: a deeper stage just streams more weight blocks through
    the same compiled kernel. The reference scopes to single ResNet-50-
    geometry layers (report.pdf section 1); the deeper family is free
    generality of the stage-parameterized design."""

    # (c_io, c_mid, hw, identity blocks after the stage entry): conv2_x
    # 1 proj + 2, conv3_x 1 transition + 3, conv4_x 1 + 22, conv5_x 1 + 2.
    stages = (
        (256, 64, 56, 2),
        (512, 128, 28, 3),
        (1024, 256, 14, 22),
        (2048, 512, 7, 2),
    )
    # Bench-only: the whole-model float64 golden chain + params would be a
    # several-hundred-MB npz; load_case regenerates it in memory instead
    # (same seeded path generate_all records in meta.json).
    on_disk = False


@dataclasses.dataclass(frozen=True)
class ResNet152Config(ResNet101Config):
    """The COMPLETE ResNet-152 classifier (conv3_x 8 blocks, conv4_x 36):
    the deepest standard bottleneck ResNet, same stage geometries again."""

    stages = (
        (256, 64, 56, 2),
        (512, 128, 28, 7),
        (1024, 256, 14, 35),
        (2048, 512, 7, 2),
    )


CASES[20] = ResNet101Config("resnet101_full")
CASES[21] = ResNet152Config("resnet152_full")


@dataclasses.dataclass(frozen=True)
class StemConfig:
    """The classifier stem in isolation: 7x7/2 conv + BN + ReLU + 3x3/2
    maxpool. No reference analog (its scope is one bottleneck stage);
    benchmarked on its own because it is the one layer with a dedicated
    fused kernel (kernels/stem.py) and it dominates the non-trunk share of
    the whole-classifier modes. Bench-only (the x/golden pair regenerates
    in memory; on_disk=False)."""

    name: str
    img: int = 224
    cin: int = 3
    cout: int = 64
    batch: int = 1
    on_disk: bool = False


CASES[22] = StemConfig("resnet50_stem")


@dataclasses.dataclass(frozen=True)
class BasicNetConfig:
    """The COMPLETE ResNet-18 classifier — the BASIC-block family (two 3x3
    convs per block; torchvision BasicBlock semantics). Stage tuples are
    (channels, hw, blocks); stage 0's blocks are all identity (the stem
    already outputs its width), later stages enter with a stride-2
    downsample block (stride-2 3x3 + 3x3, stride-2 1x1 projection skip)
    counted in `blocks`.

    No new kernels: the stride-1 3x3s run the F(2,3) Winograd megakernel
    (kernels/winograd.py), the stride-2 3x3 runs the strided-im2col fused
    GEMM (models/downsample.py::conv3x3_s2_bn_relu_pallas), the projection
    1x1 the fused pointwise kernel, and the stem/head are shared with the
    bottleneck family. The reference scopes to bottleneck layers
    (report.pdf section 1); this is the other half of the standard ResNet
    model space."""

    name: str
    stages = (
        (64, 56, 2),
        (128, 28, 2),
        (256, 14, 2),
        (512, 7, 2),
    )
    img: int = 224
    stem_c: int = 64
    num_classes: int = 1000
    batch: int = 1
    # Bench-only: load_case regenerates the case in memory (like modes
    # 20/21), no on-disk artifact set.
    on_disk = False


@dataclasses.dataclass(frozen=True)
class ResNet34Config(BasicNetConfig):
    """The COMPLETE ResNet-34 classifier: the deeper basic-block depths
    (3/4/6/3), same stage geometries and kernels as ResNet-18."""

    stages = (
        (64, 56, 3),
        (128, 28, 4),
        (256, 14, 6),
        (512, 7, 3),
    )


@dataclasses.dataclass(frozen=True)
class BasicTrainConfig(BasicNetConfig):
    """Training benchmark over the COMPLETE ResNet-18: ONE fwd+bwd step,
    image to logits, forward through the SAME fused kernels serving uses
    (models/basic.py::basicnet_forward_train — stem s2d GEMM, F(2,3)
    Winograd custom VJPs for the stride-1 3x3s, in-trace w9 layout for the
    strided entries) vs the all-XLA autodiff step. The basic-family twin
    of mode 19."""


@dataclasses.dataclass(frozen=True)
class BasicNetB8Config(BasicNetConfig):
    """Batched serving: the COMPLETE ResNet-18 classifier at N=8 (the
    basic-family twin of mode 18) — same kernels, the batch dim rides the
    kernels' image-outer grids."""

    batch: int = 8


@dataclasses.dataclass(frozen=True)
class ResNet50B32Config(ResNet50Config):
    """Serving-SCALE batch: the COMPLETE ResNet-50 classifier at N=32.
    The float64 golden chain at this batch is minutes of numpy, so the
    case is bench-only (regenerated in memory like modes 20/21)."""

    batch: int = 32
    on_disk = False


@dataclasses.dataclass(frozen=True)
class BasicNetB32Config(BasicNetConfig):
    """Serving-SCALE batch: the COMPLETE ResNet-18 classifier at N=32."""

    batch: int = 32


CASES[23] = BasicNetConfig("resnet18_full")
CASES[24] = ResNet34Config("resnet34_full")
CASES[25] = BasicTrainConfig("resnet18_trainstep")
CASES[26] = BasicNetB8Config("resnet18_full_b8")
CASES[27] = ResNet50B32Config("resnet50_full_b32")
CASES[28] = BasicNetB32Config("resnet18_full_b32")


def stem_entry_flops(img: int, stem_c: int, c_mid0: int, c_io0: int) -> int:
    """Nominal FLOPs of the stem 7x7/2 conv + conv2_x's stride-1 projection
    entry block (reduce, 3x3, expand, projection shortcut) at batch 1 —
    shared by case_flops and the pipeline's segment cost model so the two
    can't drift apart."""
    hs = img // 2
    hw0 = img // 4
    return 2 * hs * hs * 49 * 3 * stem_c + 2 * hw0 * hw0 * (
        stem_c * c_mid0 + 9 * c_mid0 * c_mid0
        + c_mid0 * c_io0 + stem_c * c_io0
    )


def case_flops(cfg) -> int:
    """Nominal conv FLOPs of a case (the conventional 2*MACs count of the
    mathematical convolution — algorithm-independent, so Winograd's FLOP
    reduction shows up as >1 apparent efficiency, like the reference's
    report compares against the direct-conv cost)."""
    if isinstance(cfg, BackboneConfig):
        total = 0
        prev = None
        for c_io, c_mid, hw, blocks in cfg.stages:
            if prev is not None:
                total += case_flops(
                    TransitionConfig("t", prev, c_mid, c_io, hw=2 * hw, batch=cfg.batch)
                )
            total += case_flops(
                BlockConfig("b", c_io=c_io, c_mid=c_mid, hw=hw,
                            batch=cfg.batch, blocks=blocks)
            )
            prev = c_io
        if isinstance(cfg, ResNet50Config):
            c_io0, c_mid0, hw0, _ = cfg.stages[0]
            total += cfg.batch * stem_entry_flops(
                cfg.img, cfg.stem_c, c_mid0, c_io0
            )
            total += 2 * cfg.batch * cfg.stages[-1][0] * cfg.num_classes
        if isinstance(cfg, (TrainConfig, FullTrainConfig)):
            total *= 3  # fwd + bwd ~ 3x forward FLOPs (standard estimate)
        return total
    if isinstance(cfg, BasicNetConfig):
        hs = cfg.img // 2
        total = 2 * hs * hs * 49 * 3 * cfg.stem_c  # stem 7x7/2 conv
        prev = cfg.stem_c
        for c, hw, blocks in cfg.stages:
            if prev != c:  # stride-2 entry block (3x3/2 + 3x3 + 1x1 proj)
                total += 2 * hw * hw * (9 * prev * c + 9 * c * c + prev * c)
                blocks -= 1
            total += blocks * 2 * hw * hw * 2 * 9 * c * c
            prev = c
        total += 2 * cfg.stages[-1][0] * cfg.num_classes  # head FC
        if isinstance(cfg, BasicTrainConfig):
            total *= 3  # fwd + bwd ~ 3x forward FLOPs (standard estimate)
        return cfg.batch * total
    if isinstance(cfg, StemConfig):
        hs = -(-cfg.img // 2)
        return 2 * cfg.batch * hs * hs * 49 * cfg.cin * cfg.cout
    if isinstance(cfg, TransitionConfig):
        ho = -(-cfg.hw // 2)
        return 2 * cfg.batch * (
            cfg.hw * cfg.hw * cfg.c_in * cfg.c_mid
            + ho * ho * (9 * cfg.c_mid * cfg.c_mid
                         + cfg.c_mid * cfg.c_out + cfg.c_in * cfg.c_out)
        )
    if isinstance(cfg, BlockConfig):
        return (
            2 * cfg.batch * cfg.blocks * cfg.hw * cfg.hw
            * (cfg.c_io * cfg.c_mid + 9 * cfg.c_mid * cfg.c_mid
               + cfg.c_mid * cfg.c_io)
        )
    k = 9 if cfg.kind == "winograd3x3" else 1
    return 2 * cfg.hw * cfg.hw * k * cfg.cin * cfg.cout


# TPU v5e single-chip peak (bf16 MXU): the MFU denominator the bench
# reports against. f32 "highest" runs at a fraction of this (multi-pass).
V5E_PEAK_FLOPS = 197e12


def case_config(mode: int):
    if mode not in CASES:
        raise ValueError(f"unknown mode {mode}; valid modes: {sorted(CASES)}")
    return CASES[mode]


# Benchmark protocol constants (reference: /root/reference/Test.c:14,45-48 —
# 100 iterations, first 2 discarded as warmup, mean of the remaining 98).
BENCH_ITERATIONS = 100
BENCH_WARMUP = 2

# Correctness bar: the reference checks |diff| > 1e-5 elementwise and accepts
# <0.1% violations (report.pdf section 5; /root/reference/util.c:55). Our bar
# (BASELINE.json) is STRICT: max abs err <= 1e-4 vs the float64 numpy golden
# model, enforced by CheckResult.ok() with no fraction allowance.
PARITY_ATOL = 1e-4
BN_EPS = 1e-5

# Reduced-precision serving-tier bounds (relative error vs the float64
# golden, NOT the f32 parity bar): the bf16 weight-storage tier is set by
# offline bf16 weight rounding (~2^-9 per weight; measured ~1e-3 on
# unit-scale data), the int8 tier by 8-bit quantization (~1e-2). Composed
# multi-layer runs (the 13/16-block backbones) compound per-layer error.
# Backbone bounds are set from measurement + margin: ~1.1e-2 (int8) /
# ~1.8e-3 (bf16w) measured across modes 13/14 (BENCH_FULL_r02.json), so
# these keep a ~3-5x margin and an accuracy regression actually trips the
# hard check (round-2 bounds had 10x+ slack that would have let a 5x
# regression pass quietly).
BF16W_RTOL = 5e-3
BF16W_RTOL_BACKBONE = 5e-3
INT8_RTOL = 5e-2
INT8_RTOL_BACKBONE = 5e-2

# bf16 weight-STORAGE training tier (f32 master weights, bf16w serving
# kernels as the forward, f32/HIGH rematerializing backward): bound on the
# train-step scalar (loss + per-leaf grad norms) agreement vs the all-XLA
# f32 autodiff step. The forward's bf16 weight rounding (~2^-9 rel)
# propagates into the loss and every gradient leaf, so the step scalar
# differs from f32 at the same order as the forward tier bound — the gate
# keeps a margin over the f32 train gate (1e-3) scaled by the measured
# forward error (~2e-3 on the composed backbones).
BF16W_TRAIN_GRAD_RTOL = 2e-2

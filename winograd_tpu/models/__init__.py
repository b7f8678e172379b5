"""Model family: ResNet bottleneck blocks/stages built from the fused kernels."""

from winograd_tpu.models.resnet import (
    BottleneckParams,
    init_bottleneck_params,
    bottleneck_block_pallas,
    bottleneck_block_baseline,
    resnet_stage_pallas,
)

__all__ = [
    "BottleneckParams",
    "init_bottleneck_params",
    "bottleneck_block_pallas",
    "bottleneck_block_baseline",
    "resnet_stage_pallas",
]

"""Model family: ResNet bottleneck blocks/stages built from the fused kernels."""

from winograd_tpu.models.resnet import (
    BottleneckParams,
    init_bottleneck_params,
    bottleneck_block_pallas,
    bottleneck_block_baseline,
    bottleneck_block_train,
    resnet_stage_pallas,
)
from winograd_tpu.models.checkpoint import save_params, load_params, export_artifacts
from winograd_tpu.models.downsample import (
    downsample_bottleneck_block_pallas,
    resnet50_stages,
)

__all__ = [
    "BottleneckParams",
    "init_bottleneck_params",
    "bottleneck_block_pallas",
    "bottleneck_block_baseline",
    "bottleneck_block_train",
    "resnet_stage_pallas",
    "save_params",
    "load_params",
    "export_artifacts",
    "downsample_bottleneck_block_pallas",
    "resnet50_stages",
]

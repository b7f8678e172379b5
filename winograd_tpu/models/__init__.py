"""Model family: ResNet bottleneck blocks/stages built from the fused kernels."""

from winograd_tpu.models.resnet import (
    BottleneckParams,
    init_bottleneck_params,
    bottleneck_block_pallas,
    bottleneck_block_baseline,
    bottleneck_block_train,
    resnet_stage_pallas,
)
from winograd_tpu.models.checkpoint import (
    export_artifacts,
    load_model,
    load_model_orbax,
    save_model_orbax,
    load_params,
    prepare_basicnet_serving,
    prepare_resnet50_serving,
    save_model,
    save_params,
)
from winograd_tpu.models.downsample import (
    downsample_bottleneck_block_pallas,
    resnet50_stages,
)
from winograd_tpu.models.resnet50 import (
    resnet50_forward_pallas,
    resnet50_forward_train,
)
from winograd_tpu.models.basic import (
    basicnet_forward_pallas,
    basicnet_forward_train,
    basicnet_params,
    quantize_basicnet,
)
from winograd_tpu.models.train import (
    make_resnet50_train_step,
    resnet50_loss,
    trainable_basicnet_params,
    trainable_resnet50_params,
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
    "save_model",
    "load_model",
    "save_model_orbax",
    "load_model_orbax",
    "prepare_resnet50_serving",
    "prepare_basicnet_serving",
    "export_artifacts",
    "downsample_bottleneck_block_pallas",
    "resnet50_stages",
    "resnet50_forward_pallas",
    "resnet50_forward_train",
    "basicnet_forward_pallas",
    "basicnet_forward_train",
    "basicnet_params",
    "quantize_basicnet",
    "resnet50_loss",
    "make_resnet50_train_step",
    "trainable_resnet50_params",
    "trainable_basicnet_params",
]

"""Multi-chip parallel layer: Mesh construction, shardings, train/infer steps."""

from winograd_tpu.parallel.mesh import make_mesh, block_shardings
from winograd_tpu.parallel.tensor_parallel import (
    conv1x1_bn_tp_reduce,
    conv1x1_bn_tp_expand,
    conv3x3_bn_tp_direct,
    bottleneck_block_tp,
    resnet_stage_tp,
    make_resnet50_tp_fn,
    resnet50_forward_tp,
    make_basicnet_tp_fn,
    basicnet_forward_tp,
)
from winograd_tpu.parallel.data_parallel import (
    sharded_block_inference,
    sharded_block_inference_pallas,
    make_train_step,
    init_train_state,
)
from winograd_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipelined_basicnet_inference,
    pipelined_resnet50_inference,
    pipelined_stage_inference,
)

__all__ = [
    "make_mesh",
    "block_shardings",
    "sharded_block_inference",
    "sharded_block_inference_pallas",
    "make_train_step",
    "init_train_state",
    "conv1x1_bn_tp_reduce",
    "conv1x1_bn_tp_expand",
    "conv3x3_bn_tp_direct",
    "bottleneck_block_tp",
    "resnet_stage_tp",
    "make_resnet50_tp_fn",
    "resnet50_forward_tp",
    "make_basicnet_tp_fn",
    "basicnet_forward_tp",
    "make_pipe_mesh",
    "pipelined_stage_inference",
    "pipelined_resnet50_inference",
    "pipelined_basicnet_inference",
]

"""winograd_tpu — a TPU-native framework of fused ResNet-inference kernels.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CUDA
reference (bssrdf/CUDA-Winograd): fused Conv+BatchNorm(inference)+ReLU
operators for the 14x14 stage of a ResNet bottleneck block —

* Winograd convolution (128->128, 256->256; both F(2,3) — the measured
  winner — and the reference's F(4,3) algebra) as a SINGLE fused Pallas
  kernel: strided-slice tile extraction -> separable VPU transforms ->
  per-position tile GEMMs on the MXU -> inverse transform with the
  folded-BN FMA and ReLU in the epilogue, staged entirely through VMEM
  (the reference round-trips each phase through global memory:
  /root/reference/Kernel128_winograd.cu:240-241).
* 1x1 pointwise convolution (512->128, 128->512, 1024->256, 256->1024) as
  one parameterized fused Pallas GEMM+BN(+ReLU) kernel (the reference has
  four hand-written variants: Kernel128_one.cu, Kernel256_one.cu).
* A jitted XLA baseline path (lax.conv_general_dilated + FMA + ReLU) that
  plays the role cuDNN plays in the reference: correctness oracle and
  performance baseline, run in-process by the benchmark harness.
* A numpy data generator producing the reference's artifact set (inputs,
  offline Winograd-transformed weights, folded BN parameters) plus float32
  golden outputs, with seed control (the reference has none).
* A benchmark CLI reproducing the reference protocol: modes 0..5 (+ block
  modes), 100 iterations, 2 warmups, elementwise parity with HARD failure
  on tolerance breach (the reference's checker never fails: util.c:46-63).
* A ResNet model family — block/stage/stride-2-transition megakernels,
  the 13-block backbone, and the COMPLETE ResNet-50 classifier (stem as a
  space-to-depth patch GEMM + 16-block trunk + head; ResNet50Engine;
  deeper depths 101/152 and the BASIC-block family 18/34 via
  ResNetBasicEngine) —
  and a multi-chip parallel layer (jax.sharding.Mesh + pjit/shard_map:
  DP, Megatron-style block TP, GPipe pipeline) for batched deployment;
  bf16-weight-storage and int8 serving tiers with weight streaming.
* Training through the SAME fused serving kernels (custom VJPs, HIGH-
  precision backwards), a model-level SGD API (models/train.py), and the
  checkpoint -> offline-preprocessing -> serve deployment pipeline
  (models/checkpoint.py).
* A native C++ host-runtime library (binary blob IO, timing, differential
  checking) mirroring the reference's C host layer (util.c), bound via
  ctypes with a pure-Python fallback.
"""

from winograd_tpu.config import (
    CASES,
    BackboneConfig,
    BasicNetConfig,
    BlockConfig,
    LayerConfig,
    ResNet50Config,
    ResNet34Config,
    ResNet101Config,
    ResNet152Config,
    TransitionConfig,
    case_config,
)
from winograd_tpu.ops import jnp_ops, reference
from winograd_tpu.baseline import xla as baseline_xla
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas
from winograd_tpu.kernels.block import bottleneck_block_fused_pallas
from winograd_tpu.kernels.transition import transition_block_fused_pallas
from winograd_tpu.kernels.stage import resnet_stage_fused_pallas
from winograd_tpu.engine import (
    BackboneEngine,
    BottleneckEngine,
    ResNet50Engine,
    ResNetBasicEngine,
    engine_from_torch,
)
from winograd_tpu.models.import_torch import (
    basicnet_serving_params_from_torch,
    basicnet_train_params_from_torch,
    resnet_serving_params_from_torch,
    resnet_train_params_from_torch,
)

__version__ = "0.3.0"

__all__ = [
    "CASES",
    "LayerConfig",
    "BlockConfig",
    "TransitionConfig",
    "BackboneConfig",
    "ResNet50Config",
    "BasicNetConfig",
    "ResNet34Config",
    "ResNet101Config",
    "ResNet152Config",
    "resnet_serving_params_from_torch",
    "resnet_train_params_from_torch",
    "basicnet_serving_params_from_torch",
    "basicnet_train_params_from_torch",
    "case_config",
    "jnp_ops",
    "reference",
    "baseline_xla",
    "conv1x1_bn_pallas",
    "conv3x3_bn_winograd_pallas",
    "conv3x3_bn_direct_pallas",
    "bottleneck_block_fused_pallas",
    "transition_block_fused_pallas",
    "resnet_stage_fused_pallas",
    "BottleneckEngine",
    "BackboneEngine",
    "ResNet50Engine",
    "ResNetBasicEngine",
    "engine_from_torch",
    "__version__",
]

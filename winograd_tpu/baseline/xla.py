"""Jitted XLA baseline ops — the "vendor library" path.

In the reference, every benchmark entry point runs the identical math twice:
custom CUDA kernels vs cuDNN (descriptor setup + cudnnConvolutionForward +
cudnnBatchNormalizationForwardInference + cudnnActivationForward,
/root/reference/Kernel128_winograd.cu:322-404). On TPU the vendor path is
XLA itself: `lax.conv_general_dilated` + FMA + ReLU under `jax.jit`, which
XLA fuses into its own conv+epilogue program. The benchmark harness times
the Pallas kernels against these, and the parity checker compares both
against the numpy golden outputs.
"""

from __future__ import annotations

import functools

import jax

from winograd_tpu.ops import jnp_ops


@functools.partial(jax.jit, static_argnames=("relu",))
def conv3x3_bn_relu(x, w, scale, bias, relu: bool = True):
    return jnp_ops.conv3x3_bn_relu(x, w, scale, bias, relu)


@functools.partial(jax.jit, static_argnames=("relu",))
def conv1x1_bn(x, w, scale, bias, relu: bool):
    return jnp_ops.conv1x1_bn(x, w, scale, bias, relu)


@jax.jit
def bottleneck_block(x, params):
    return jnp_ops.bottleneck_block(x, params)

"""Sharded inference and training steps over a (data, model) mesh.

Inference uses the jnp ops (XLA inserts the DP/TP collectives implied by
the shardings in parallel/mesh.py). Training — absent from the reference
("no training related operations", report.pdf §1) — is included because a
deployable TPU framework needs it: an MSE-distillation objective over the
bottleneck block with SGD, jitted with explicit input/param shardings so
gradients reduce over "data" and TP-sharded matmuls stay local.
"""

from __future__ import annotations


from typing import Tuple

import jax
import jax.numpy as jnp

from winograd_tpu.models.resnet import init_bottleneck_params
from winograd_tpu.ops import jnp_ops
from winograd_tpu.parallel.mesh import block_shardings


def sharded_block_inference(mesh, params, x):
    """Jit the bottleneck block with DP/TP shardings over `mesh`."""
    x_sh, p_sh = block_shardings(mesh)
    p_sh = {k: p_sh[k] for k in params}
    fn = jax.jit(jnp_ops.bottleneck_block, in_shardings=(x_sh, p_sh))
    return fn(x, jax.device_put(params, p_sh))


def sharded_block_inference_pallas(mesh, params, x, algo3x3: str = "auto"):
    """Data-parallel fused-kernel inference: shard_map over the "data" axis,
    each device running the single fused Pallas kernels on its batch shard
    (params replicated — the serving layout for this model size; for
    channel-sharded serving of the same block see
    tensor_parallel.bottleneck_block_tp, which runs the fused kernels under
    Megatron-style TP with one psum per block)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from winograd_tpu.models.resnet import bottleneck_block_pallas

    n_data = mesh.shape["data"]
    assert x.shape[0] % n_data == 0, (x.shape, n_data)

    def local_fn(x_local, params_local):
        return bottleneck_block_pallas(x_local, params_local, algo3x3=algo3x3)

    p_spec = jax.tree.map(lambda _: P(), params)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", None, None, None), p_spec),
        out_specs=P("data", None, None, None),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return jax.jit(fn)(x, params)


def init_train_state(key, c_io: int, c_mid: int):
    """Params + momentum buffers for SGD."""
    params = init_bottleneck_params(key, c_io=c_io, c_mid=c_mid)
    # Training uses the raw 3x3 filter; u_mid/u2_mid/w9_mid are
    # inference-time offline artifacts (re-derived after training).
    params.pop("u_mid")
    params.pop("u2_mid")
    params.pop("w9_mid")
    momentum = jax.tree.map(jnp.zeros_like, params)
    return params, momentum


def _loss(params, x, target, use_pallas: bool):
    if use_pallas:
        from winograd_tpu.models.resnet import bottleneck_block_train

        pred = bottleneck_block_train(x, params)
    else:
        pred = jnp_ops.bottleneck_block(x, params)
    return jnp.mean((pred - target) ** 2)


def make_train_step(mesh, lr: float = 1e-3, beta: float = 0.9, use_pallas: bool = False):
    """Return a jitted SGD-with-momentum train step sharded over `mesh`.

    use_pallas runs the forward through the fused Pallas kernels (custom
    VJPs); the default XLA path is the safe choice under channel sharding
    (the Pallas kernels expect full channel blocks per device).
    """
    x_sh, p_sh_full = block_shardings(mesh)

    def step(params, momentum, x, target) -> Tuple:
        loss, grads = jax.value_and_grad(
            lambda p, x_, t_: _loss(p, x_, t_, use_pallas)
        )(params, x, target)
        momentum = jax.tree.map(lambda m, g: beta * m + g, momentum, grads)
        params = jax.tree.map(lambda p, m: p - lr * m, params, momentum)
        return params, momentum, loss

    # Memoize the jit wrapper per param key-set so steady-state steps hit
    # the compiled fast path instead of re-wrapping every call.
    _cache = {}

    def jitted(params, momentum, x, target):
        key = frozenset(params)
        fn = _cache.get(key)
        if fn is None:
            p_sh = {k: p_sh_full[k] for k in params}
            fn = _cache[key] = jax.jit(step, in_shardings=(p_sh, p_sh, x_sh, x_sh))
        return fn(params, momentum, x, target)

    return jitted

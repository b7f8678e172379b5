"""Whole-classifier training loop utilities.

The reference is inference-only (report.pdf §1); the framework's training
story runs the SAME fused serving kernels forward (custom VJPs,
kernels/vjp.py; benchmarked as modes 17/19). This module supplies the
model-level pieces around that forward: a classification loss, an
SGD-with-momentum step over the full nested param pytree, and checkpoint
integration — so train -> checkpoint -> offline-prep -> serve is one
unbroken pipeline (models/checkpoint.py, ResNet50Engine.from_checkpoint).

Params are the mode-19 TRAINABLE parameterization: raw filters + folded BN
(stem {w7_stem, s_stem, b_stem}; proj/stages with raw w_mid; head
{w_fc, b_fc}); offline GEMM/Winograd layouts are derived in-trace by the
train forwards and regenerated for deployment by prepare_resnet50_serving.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def resnet50_loss(
    params: Dict, x: jax.Array, labels: jax.Array,
    precision: str | None = None,
) -> jax.Array:
    """Mean softmax cross-entropy of the fused-kernel forward.
    x: (N, H, W, 3) or (H, W, 3); labels: int class ids, shape (N,) or ().
    precision="bf16w" trains through the bf16 weight-storage tier (f32
    master params, bf16w serving kernels as the forward)."""
    from winograd_tpu.models.resnet50 import resnet50_forward_train

    logits = resnet50_forward_train(x, params, precision)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        jnp.atleast_2d(logp), jnp.atleast_1d(labels)[:, None], axis=-1
    )
    return -jnp.mean(picked)


def make_resnet50_train_step(lr: float = 1e-2, beta: float = 0.9, mesh=None,
                             precision: str | None = None):
    """Jitted SGD-with-momentum step over the full classifier:
    (params, momentum, x, labels) -> (params, momentum, loss).
    Initialize momentum with jax.tree.map(jnp.zeros_like, params).
    precision="bf16w" runs the bf16 weight-storage training tier (half the
    forward's streamed weight bytes; grads bounded by
    config.BF16W_TRAIN_GRAD_RTOL vs the f32 step).

    With a mesh, the step is DATA-parallel: the batch shards over the
    "data" axis, every chip runs the fused-kernel fwd+bwd on its shard
    inside shard_map (Pallas custom calls cannot be auto-partitioned by
    jit), and gradients/loss are pmean'd over the axis — identical math to
    the single-chip step because the loss is a mean over the batch."""

    def loss_fn(params, x, labels):
        return resnet50_loss(params, x, labels, precision)

    if mesh is None:

        @jax.jit
        def step(params, momentum, x, labels) -> Tuple:
            loss, grads = jax.value_and_grad(loss_fn)(params, x, labels)
            momentum = jax.tree.map(lambda m, g: beta * m + g, momentum, grads)
            params = jax.tree.map(lambda p, m: p - lr * m, params, momentum)
            return params, momentum, loss

        return step

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    # shard_map's in_specs must match the param pytree, which is only
    # known at call time — build and memoize per tree structure.
    _cache = {}

    def jitted(params, momentum, x, labels):
        key = jax.tree_util.tree_structure((params, momentum))
        fn = _cache.get(key)
        if fn is None:
            p_spec = jax.tree.map(lambda _: P(), params)

            def local(params_, momentum_, x_, labels_):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params_, x_, labels_
                )
                grads = jax.lax.pmean(grads, "data")
                loss = jax.lax.pmean(loss, "data")
                momentum_ = jax.tree.map(
                    lambda m, g: beta * m + g, momentum_, grads
                )
                params_ = jax.tree.map(
                    lambda p, m: p - lr * m, params_, momentum_
                )
                return params_, momentum_, loss

            inner = shard_map(
                local,
                mesh=mesh,
                in_specs=(p_spec, p_spec, P("data", None, None, None), P("data")),
                out_specs=(p_spec, p_spec, P()),
                check_vma=False,
            )
            fn = _cache[key] = jax.jit(inner)
        return fn(params, momentum, x, labels)

    return jitted


def trainable_resnet50_params(full: Dict) -> Dict:
    """Strip the serving-only offline artifacts from a full param structure
    (resnet50_params / init_resnet50_params), leaving the trainable set
    that resnet50_forward_train and prepare_resnet50_serving expect."""
    drop = ("u_mid", "u2_mid", "w9_mid", "w49_stem", "w192_stem", "wep", "bep")

    def keep(d):
        return {k: jnp.asarray(v) for k, v in d.items() if k not in drop}

    return {
        "stem": keep(full["stem"]),
        "proj": keep(full["proj"]),
        "stages": [
            {
                "transition": None
                if st.get("transition") is None
                else keep(st["transition"]),
                "blocks": [keep(b) for b in st["blocks"]],
            }
            for st in full["stages"]
        ],
        "head": keep(full["head"]),
    }


def trainable_basicnet_params(full: Dict) -> Dict:
    """Strip the serving-only offline artifacts from a full BASIC-block
    param structure (models/basic.py::basicnet_params), leaving the
    trainable set that basicnet_forward_train and
    prepare_basicnet_serving expect (raw OIHW filters + folded BN)."""
    drop = ("u2_a", "u2_b", "w9_a", "w9_b", "w49_stem", "w192_stem")

    def keep(d):
        return {k: jnp.asarray(v) for k, v in d.items() if k not in drop}

    return {
        "stem": keep(full["stem"]),
        "stages": [
            {
                "entry": None
                if st.get("entry") is None
                else keep(st["entry"]),
                "blocks": [keep(b) for b in st["blocks"]],
            }
            for st in full["stages"]
        ],
        "head": keep(full["head"]),
    }

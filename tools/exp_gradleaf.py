"""Round-4 experiment: PER-LEAF gradient agreement of the fused train step
vs XLA-HIGHEST autodiff, under each BWD_PRECISION setting.

The bench harness's train_grad_rel_error is a scalar aggregate (loss +
grad-norm summary, bench/cli.py:151); before lowering BWD_PRECISION we
need evidence the per-parameter gradients hold too. Reports, for each
leaf, ||g_fused - g_xla|| / ||g_xla|| (norm-relative) and the worst leaf.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_gradleaf.py [17]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.datagen.generate import make_case


def grads(fwd, params, x):
    def loss(p, x_):
        out = fwd(x_, p)
        return jnp.sum(out * out)

    return jax.jit(jax.grad(loss))(params, x)


def run(mode: int):
    from winograd_tpu.config import CASES
    from winograd_tpu.kernels import vjp

    case = make_case(mode, seed=0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)

    from winograd_tpu.datagen.generate import backbone_stages
    from winograd_tpu.models.downsample import resnet50_stages_train
    from winograd_tpu.ops import jnp_ops

    def _trainable(d):
        drop = ("u_mid", "u2_mid", "w9_mid")
        return {
            k: jax.device_put(jnp.asarray(v), dev)
            for k, v in d.items()
            if k not in drop
        }

    params = [
        {
            "transition": None
            if st["transition"] is None
            else _trainable(st["transition"]),
            "blocks": [_trainable(b) for b in st["blocks"]],
        }
        for st in backbone_stages(CASES[mode], case)
    ]

    def fwd_xla(x_, st):
        for s_ in st:
            if s_["transition"] is not None:
                x_ = jnp_ops.downsample_bottleneck_block(x_, s_["transition"])
            for b in s_["blocks"]:
                x_ = jnp_ops.bottleneck_block(x_, b)
        return x_

    gx = grads(fwd_xla, params, x)
    gx_flat = {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(gx)
    }

    for prec_name, prec, dw_prec in (
        ("HIGH", jax.lax.Precision.HIGH, None),
        ("DEFAULT", jax.lax.Precision.DEFAULT, None),
        ("MIXED(dx=DEFAULT,dw=HIGH)", jax.lax.Precision.DEFAULT,
         jax.lax.Precision.HIGH),
    ):
        vjp.BWD_PRECISION = prec
        vjp.DW_PRECISION = dw_prec
        gp = grads(lambda x_, p: resnet50_stages_train(x_, p), params, x)
        gp_flat = {
            jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(gp)
        }
        worst, worst_key = 0.0, None
        for k, ref in gx_flat.items():
            d = np.linalg.norm(gp_flat[k] - ref) / max(np.linalg.norm(ref), 1e-30)
            if d > worst:
                worst, worst_key = d, k
        print(
            f"mode {mode} bwd={prec_name}: worst leaf rel {worst:.3e} at {worst_key}",
            file=sys.stderr,
        )
    vjp.BWD_PRECISION = jax.lax.Precision.HIGH
    vjp.DW_PRECISION = None


if __name__ == "__main__":
    for m in [int(a) for a in sys.argv[1:]] or [17]:
        run(m)

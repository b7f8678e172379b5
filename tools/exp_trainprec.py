"""Round-4 experiment: backward-precision ladder for the train step
(VERDICT r3 ask #7 — mode 19 wins vs XLA autodiff but at 5.3% MFU; is
HIGH needed on EVERY backward GEMM to hold the 1e-3 grad bound?).

Runs the mode-17 (13-block backbone) and mode-19 (full classifier) train
steps with kernels/vjp.py::BWD_PRECISION patched to DEFAULT / HIGH and
reports the grad-agreement error vs the all-XLA HIGHEST autodiff step
plus the device time of each.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_trainprec.py [17|19]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.datagen.generate import make_case
from winograd_tpu.utils.timing import bench_scan


def build_step(fwd, params):
    def loss(p, x_):
        out = fwd(x_, p)
        return jnp.sum(out * out)

    def step(x_):
        l, g = jax.value_and_grad(loss)(params, x_)
        return l + sum(
            jnp.vdot(leaf, leaf) for leaf in jax.tree_util.tree_leaves(g)
        )

    return jax.jit(step)


def run(mode: int):
    from winograd_tpu.config import CASES
    from winograd_tpu.kernels import vjp

    case = make_case(mode, seed=0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)

    if mode == 19:
        from winograd_tpu.models.resnet50 import (
            resnet50_forward_train,
            resnet50_forward_xla,
            resnet50_params,
        )
        from winograd_tpu.models.train import trainable_resnet50_params

        params = jax.device_put(
            trainable_resnet50_params(resnet50_params(case, CASES[mode])), dev
        )
        fwd_fused, fwd_xla = resnet50_forward_train, resnet50_forward_xla
    else:
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
        fwd_fused = lambda x_, p: resnet50_stages_train(x_, p)

        def fwd_xla(x_, st):
            for s_ in st:
                if s_["transition"] is not None:
                    x_ = jnp_ops.downsample_bottleneck_block(x_, s_["transition"])
                for b in s_["blocks"]:
                    x_ = jnp_ops.bottleneck_block(x_, b)
            return x_

    step_xla = build_step(fwd_xla, params)
    gx = float(jax.block_until_ready(step_xla(x)))
    t_xla = bench_scan(step_xla, x, scan_len=None)
    print(f"mode {mode} xla_autodiff: device {t_xla:.1f} us", file=sys.stderr)

    for prec_name, prec, dw_prec in (
        ("HIGH", jax.lax.Precision.HIGH, None),
        ("DEFAULT", jax.lax.Precision.DEFAULT, None),
        ("MIXED(dx=DEFAULT,dw=HIGH)", jax.lax.Precision.DEFAULT,
         jax.lax.Precision.HIGH),
    ):
        vjp.BWD_PRECISION = prec
        vjp.DW_PRECISION = dw_prec
        step_fused = build_step(fwd_fused, params)
        gp = float(jax.block_until_ready(step_fused(x)))
        rel = abs(gp - gx) / max(abs(gx), 1.0)
        t = bench_scan(step_fused, x, scan_len=None)
        print(
            f"mode {mode} fused bwd={prec_name}: device {t:.1f} us "
            f"grad_rel={rel:.3e}",
            file=sys.stderr,
        )
    vjp.BWD_PRECISION = jax.lax.Precision.HIGH
    vjp.DW_PRECISION = None


if __name__ == "__main__":
    modes = [int(a) for a in sys.argv[1:]] or [17]
    for m in modes:
        run(m)

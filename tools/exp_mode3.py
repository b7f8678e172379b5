"""Round-4 experiment: mode 3 (1x1 128->512 no-ReLU) single-tile variants.

Hypothesis: the 196->256 row pad (an extra XLA pad op before the kernel)
plus the out[:196] slice after it cost mode 3 its loss to XLA (2.24 vs
1.79 us). With tile_p == p the pad and the slice both disappear and the
kernel reads/writes exactly the live rows.

Run on the real TPU: python tools/exp_mode3.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.baseline import xla as xla_baseline
from winograd_tpu.datagen.generate import make_case
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.utils.timing import bench_scan


def run(mode: int):
    case = make_case(mode, seed=0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)
    w = jax.device_put(jnp.asarray(case["w"]), dev)
    s = jax.device_put(jnp.asarray(case["scale"]), dev)
    b = jax.device_put(jnp.asarray(case["bias"]), dev)
    from winograd_tpu.config import CASES

    relu = CASES[mode].relu
    golden = np.asarray(case["golden"])

    def parity(fn, name):
        y = np.asarray(jax.block_until_ready(fn(x)))
        err = float(np.max(np.abs(y.reshape(golden.shape) - golden)))
        print(f"  {name}: max_err={err:.3e}", file=sys.stderr)
        assert err <= 1e-4, (name, err)

    variants = {
        "default": lambda x_: conv1x1_bn_pallas(x_, w, s, b, relu),
        "tp196": lambda x_: conv1x1_bn_pallas(x_, w, s, b, relu, tile_p=196),
        "xla": lambda x_: xla_baseline.conv1x1_bn(x_, w, s, b, relu),
    }
    print(f"=== mode {mode} (relu={relu}) ===", file=sys.stderr)
    for name, fn in variants.items():
        parity(fn, name)
        t = bench_scan(fn, x, scan_len=None)
        print(f"  mode {mode} {name}: device {t:.3f} us", file=sys.stderr)


if __name__ == "__main__":
    modes = [int(a) for a in sys.argv[1:]] or [3, 2]
    for m in modes:
        run(m)

"""Round-4 experiment B: pointwise tile variants across modes 2-5 with the
new no-pad default (tile_p = p), plus mode-3 output-column tilings.

Run on the real TPU: python tools/exp_mode3b.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.baseline import xla as xla_baseline
from winograd_tpu.config import CASES
from winograd_tpu.datagen.generate import make_case
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.utils.timing import bench_scan


def run(mode: int, extra_variants=()):
    case = make_case(mode, seed=0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)
    w = jax.device_put(jnp.asarray(case["w"]), dev)
    s = jax.device_put(jnp.asarray(case["scale"]), dev)
    b = jax.device_put(jnp.asarray(case["bias"]), dev)
    relu = CASES[mode].relu
    golden = np.asarray(case["golden"])

    variants = {
        "nopad_default": lambda x_: conv1x1_bn_pallas(x_, w, s, b, relu),
        "xla": lambda x_: xla_baseline.conv1x1_bn(x_, w, s, b, relu),
    }
    for name, kwargs in extra_variants:
        variants[name] = lambda x_, kw=kwargs: conv1x1_bn_pallas(x_, w, s, b, relu, **kw)
    print(f"=== mode {mode} (relu={relu}) ===", file=sys.stderr)
    for name, fn in variants.items():
        y = np.asarray(jax.block_until_ready(fn(x))).reshape(golden.shape)
        err = float(np.max(np.abs(y - golden)))
        assert err <= 1e-4, (name, err)
        t = bench_scan(fn, x, scan_len=None)
        print(f"  mode {mode} {name}: device {t:.3f} us (err {err:.1e})", file=sys.stderr)


if __name__ == "__main__":
    run(3, extra_variants=[
        ("tn256", {"tile_n": 256}),
        ("tn128", {"tile_n": 128}),
        ("hi", {"precision": "highest"}),
    ])
    run(2)
    run(4)
    run(5)

"""Round-4 experiment: int8 Winograd F(2,3) vs int8 direct im2col on the
standalone 3x3 modes 0/1 (VERDICT r3 weak #4: mode-0 int8 3.14 us >= f32
3.12, because the direct kernel pays im2col staging the Winograd transform
avoids).

Run on the real TPU: python tools/exp_int8wino.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.datagen.generate import make_case
from winograd_tpu.kernels.direct import direct_filter
from winograd_tpu.kernels.quantized import (
    conv3x3_bn_int8_pallas,
    conv3x3_bn_winograd_int8_pallas,
    quantize_weights,
    quantize_winograd_filter,
)
from winograd_tpu.utils.timing import bench_scan


def run(mode: int):
    case = make_case(mode, seed=0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)
    s = jax.device_put(jnp.asarray(case["scale"]), dev)
    b = jax.device_put(jnp.asarray(case["bias"]), dev)
    golden = np.asarray(case["golden"])

    w9 = np.asarray(direct_filter(jnp.asarray(case["w"])))
    w9q, sw9 = quantize_weights(w9)
    w9q, sw9 = jax.device_put(jnp.asarray(w9q), dev), jax.device_put(jnp.asarray(sw9), dev)
    uq, su = quantize_winograd_filter(np.asarray(case["u2"]))
    uq, su = jax.device_put(jnp.asarray(uq), dev), jax.device_put(jnp.asarray(su), dev)

    variants = {
        "int8_direct": lambda x_: conv3x3_bn_int8_pallas(x_, w9q, sw9, s, b, relu=True),
        "int8_wino": lambda x_: conv3x3_bn_winograd_int8_pallas(x_, uq, su, s, b, relu=True),
    }
    print(f"=== mode {mode} ===", file=sys.stderr)
    for name, fn in variants.items():
        y = np.asarray(jax.block_until_ready(fn(x))).reshape(golden.shape)
        rel = float(np.abs(y - golden).max() / max(np.abs(golden).max(), 1.0))
        print(f"  {name}: rel_err={rel:.3e}", file=sys.stderr)
        assert rel < 5e-2, (name, rel)
        t = bench_scan(fn, x, scan_len=None)
        print(f"  mode {mode} {name}: device {t:.3f} us", file=sys.stderr)


if __name__ == "__main__":
    modes = [int(a) for a in sys.argv[1:]] or [0, 1]
    for m in modes:
        run(m)

"""Round-4 experiment: split the stem's XLA producer cost (VERDICT r3 ask
#3 — mode 22 pays ~65 us in the s2d/concat relayout the kernel never sees).

Measures, on the real TPU, the device time of:
  a) full           — the served stem (producer + kernel)
  b) producer       — pad + s2d transpose + 4-shift concat + K pad only
  c) s2d_only       — pad + s2d transpose (no concat)
  d) kernel_only    — the pallas_call fed a PREBUILT xb operand
(c) vs (b) splits the transpose from the concat; (d) is the floor a
host-side preprocessed-input contract reaches.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_stemsplit.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.datagen.generate import make_case
from winograd_tpu.kernels.stem import stem_prepare_input, stem_fused_pallas_pre
from winograd_tpu.utils.timing import bench_scan


def main():
    case = make_case(22, seed=0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)
    w192 = jax.device_put(jnp.asarray(case["stem_w192"]), dev)
    s = jax.device_put(jnp.asarray(case["stem_scale"]), dev)
    b = jax.device_put(jnp.asarray(case["stem_bias"]), dev)
    golden = np.asarray(case["golden"])

    from winograd_tpu.kernels.stem import stem_fused_pallas

    h, w, cin = x.shape[-3], x.shape[-2], x.shape[-1]

    def producer(x_):
        return stem_prepare_input(x_, precision="bf16x3")

    def s2d_only(x_):
        # The pad + space-to-depth transpose WITHOUT the 4-shift concat.
        ho, wo = -(-h // 2), -(-w // 2)
        wo_pad = -(-wo // 8) * 8
        hp, wp = 2 * (ho + 3), 2 * (wo_pad + 3)
        xp = jnp.pad(x_[None], ((0, 0), (3, hp - 3 - h), (3, wp - 3 - w), (0, 0)))
        s2d = xp.reshape(1, hp // 2, 2, wp // 2, 2, cin)
        return s2d.transpose(0, 1, 3, 2, 4, 5).reshape(1, hp // 2, wp // 2, 4 * cin)

    xb = jax.block_until_ready(jax.jit(producer)(x))
    xb = jax.device_put(np.asarray(xb), dev)

    def kernel_only(xb_):
        return stem_fused_pallas_pre(xb_, w192, s, b, h=h, w=w, precision="bf16x3")

    variants = {
        "full": lambda x_: stem_fused_pallas(x_, w192, s, b),
        "producer": producer,
        "s2d_only": s2d_only,
        "kernel_only": kernel_only,
    }
    y = np.asarray(jax.block_until_ready(variants["full"](x)))
    err = float(np.abs(y - golden).max())
    assert err <= 1e-4, err
    yk = np.asarray(jax.block_until_ready(kernel_only(xb)))[0]
    errk = float(np.abs(yk - golden).max())
    assert errk <= 1e-4, errk
    for name, fn in variants.items():
        arg = xb if name == "kernel_only" else x
        t = bench_scan(fn, arg, scan_len=None)
        print(f"  stem {name}: device {t:.1f} us", file=sys.stderr)


if __name__ == "__main__":
    main()

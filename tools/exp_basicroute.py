"""Round-4 experiment: winograd-vs-direct routing table for the BASIC
family's stride-1 3x3 geometries (VERDICT r3 ask #6 — ResNet-18 at 5.9%
MFU vs ResNet-50's 10.9%).

Hypothesis: at 7x7x512 the F(2,3) artifact streams 16/9x the bytes of the
direct w9 layout (16.8 vs 9.4 MB) while the map is too small for the FLOP
saving to matter — the basic family's conv5-analog stage3 (3 such convs)
is weight-stream-bound and should route DIRECT. Measures both kernels
(f32 + bf16w) on every basic geometry.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_basicroute.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.datagen.generate import _bn_params, _rand
from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter
from winograd_tpu.kernels.transforms import transform_filter
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.ops import reference
from winograd_tpu.utils.timing import bench_scan

GEOMS = [  # (hw, c) — ResNet-18/34 stride-1 3x3 shapes
    (56, 64),
    (28, 128),
    (14, 256),
    (7, 512),
]


def run(hw: int, c: int):
    rng = np.random.default_rng(hw + c)
    dev = jax.devices()[0]
    x = _rand(rng, hw, hw, c)
    w = _rand(rng, c, c, 3, 3) * 0.2
    bn = _bn_params(rng, c, scale=0.5)
    gold = np.asarray(
        reference.conv3x3_bn_relu(
            x.astype(np.float64), w, bn["scale"], bn["bias"], relu=True
        ),
        np.float32,
    )
    xd = jax.device_put(jnp.asarray(x), dev)
    u2 = jax.device_put(jnp.asarray(transform_filter(w, m=2)), dev)
    w9 = jax.device_put(direct_filter(jnp.asarray(w)), dev)
    s = jax.device_put(jnp.asarray(bn["scale"]), dev)
    b = jax.device_put(jnp.asarray(bn["bias"]), dev)

    variants = {
        "wino_f32": lambda x_: conv3x3_bn_winograd_pallas(x_, u2, s, b, relu=True),
        "direct_f32": lambda x_: conv3x3_bn_direct_pallas(x_, w9, s, b, relu=True),
        "wino_bf16w": lambda x_: conv3x3_bn_winograd_pallas(
            x_, u2, s, b, relu=True, precision="bf16w"
        ),
        "direct_bf16w": lambda x_: conv3x3_bn_direct_pallas(
            x_, w9, s, b, relu=True, precision="bf16w"
        ),
    }
    print(f"=== {hw}x{hw}x{c} ===", file=sys.stderr)
    for name, fn in variants.items():
        try:  # whole-image VMEM staging can OOM the direct kernel at 56x56
            y = np.asarray(jax.block_until_ready(fn(xd)))
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"  {hw}x{hw}x{c} {name}: FAILED ({msg})", file=sys.stderr)
            continue
        err = float(np.abs(y - gold).max())
        rel = err / max(float(np.abs(gold).max()), 1.0)
        if name.endswith("f32"):
            assert err <= 1e-4, (name, err)
        else:
            assert rel <= 5e-3, (name, rel)
        t = bench_scan(fn, xd, scan_len=None)
        print(f"  {hw}x{hw}x{c} {name}: device {t:.2f} us", file=sys.stderr)


if __name__ == "__main__":
    for hw, c in GEOMS:
        run(hw, c)

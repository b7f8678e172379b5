"""Round-4 experiment: the fused basic-stage kernel vs the per-layer
composition (VERDICT r3 ask #6, second pass — mode 23 at 266.6 us after
the lane-packed 64ch kernel; target <= ~250).

Hypothesis: the 7x7x512 identity basic block is weight-stream bound
(2 x 9.4 MB of filters over a 49-row map); fusing both convs + the skip
into ONE weight-streaming pallas_call (kernels/basic_stage.py) removes
the per-conv HBM activation round trips and kernel launches — per-layer
direct measured 16.2 us/conv f32 against an 11.6 us HBM floor. Also
probes 14x14x256, where per-layer winograd (7.9 us) currently beats
per-layer direct (10.1): the fused direct route streams 2.36 MB/conv vs
winograd's 4.2 — fusion may flip it.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_basicstage.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.datagen.generate import _bn_params, _rand
from winograd_tpu.kernels.basic_stage import (
    basic_stage_fused_pallas,
    basic_stage_int8_pallas,
    quantize_basic_stage_params,
    stack_basic_stage_params,
)
from winograd_tpu.kernels.direct import direct_filter
from winograd_tpu.kernels.transforms import transform_filter
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.models.basic import basic_block_pallas
from winograd_tpu.ops import reference
from winograd_tpu.utils.timing import bench_scan

GEOMS = [  # (hw, c, n_blocks)
    (7, 512, 1),   # ResNet-18 conv5_x identity run
    (7, 512, 2),   # ResNet-34 conv5_x identity run
    (14, 256, 1),  # conv4_x probe: does fusion flip the wino-vs-direct call?
]


def run(hw: int, c: int, nb: int):
    rng = np.random.default_rng(hw + c + nb)
    dev = jax.devices()[0]
    x = _rand(rng, hw, hw, c)
    blocks, gold = [], x.astype(np.float64)
    for _ in range(nb):
        wa = _rand(rng, c, c, 3, 3) * 0.2
        wb = _rand(rng, c, c, 3, 3) * 0.2
        bna = _bn_params(rng, c, scale=0.5)
        bnb = _bn_params(rng, c, scale=0.5)
        h = reference.conv3x3_bn_relu(gold, wa, bna["scale"], bna["bias"], relu=True)
        h = reference.conv3x3_bn_relu(h, wb, bnb["scale"], bnb["bias"], relu=False)
        gold = np.maximum(h + gold, 0.0)
        blocks.append({
            "w9_a": direct_filter(jnp.asarray(wa)),
            "u2_a": jnp.asarray(transform_filter(wa, m=2)),
            "s_a": jnp.asarray(bna["scale"]), "b_a": jnp.asarray(bna["bias"]),
            "w9_b": direct_filter(jnp.asarray(wb)),
            "u2_b": jnp.asarray(transform_filter(wb, m=2)),
            "s_b": jnp.asarray(bnb["scale"]), "b_b": jnp.asarray(bnb["bias"]),
        })
    gold = np.asarray(gold, np.float32)
    xd = jax.device_put(jnp.asarray(x), dev)
    blocks = jax.device_put(blocks, dev)
    stacked = jax.device_put(stack_basic_stage_params(blocks), dev)
    qstacked = jax.device_put(quantize_basic_stage_params(blocks), dev)

    def per_layer(x_, precision=None):
        for b in blocks:
            x_ = basic_block_pallas(x_, b, precision)
        return x_

    def per_layer_wino(x_, precision=None):
        kw = {} if precision is None else {"precision": precision}
        for b in blocks:
            h = conv3x3_bn_winograd_pallas(x_, b["u2_a"], b["s_a"], b["b_a"],
                                           relu=True, **kw)
            h = conv3x3_bn_winograd_pallas(h, b["u2_b"], b["s_b"], b["b_b"],
                                           relu=False, **kw)
            x_ = jnp.maximum(h + x_, 0.0)
        return x_

    variants = {
        "fused_f32": lambda x_: basic_stage_fused_pallas(x_, stacked),
        "perlayer_f32": per_layer,
        "perlayer_wino_f32": per_layer_wino,
        "fused_bf16w": lambda x_: basic_stage_fused_pallas(
            x_, stacked, precision="bf16w"
        ),
        "perlayer_bf16w": lambda x_: per_layer(x_, "bf16w"),
        "fused_int8": lambda x_: basic_stage_int8_pallas(x_, qstacked),
    }
    print(f"=== {hw}x{hw}x{c} x{nb} blocks ===", file=sys.stderr)
    for name, fn in variants.items():
        try:
            y = np.asarray(jax.block_until_ready(fn(xd)))
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"  {name}: FAILED ({msg})", file=sys.stderr)
            continue
        rel = float(np.abs(y - gold).max()) / max(float(np.abs(gold).max()), 1.0)
        bound = 5e-2 if "int8" in name else 5e-3 if "bf16w" in name else 1e-4
        assert rel <= bound, (name, rel)
        t = bench_scan(fn, xd, scan_len=None)
        print(f"  {name}: device {t:.2f} us (rel {rel:.1e})", file=sys.stderr)


if __name__ == "__main__":
    for hw, c, nb in GEOMS:
        run(hw, c, nb)

"""Round-4 experiment: weight-resident vs image-outer stage layouts at
SERVING-SCALE batch N=32 (VERDICT r3 ask #4: the N=8 dead-end verdict on
resident layouts, CLAUDE.md, doesn't automatically extend to N=32 where
weight-stream amortization flips).

Geometries: conv5_x (2048/512 @ 7x7, 2 blocks — the most weight-stream-
bound stage) and conv4_x (1024/256 @ 14x14, 5 blocks), f32 + bf16w.

Run on the real TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_resident32.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.config import BlockConfig
from winograd_tpu.datagen.generate import block_params_list, make_block_case
from winograd_tpu.kernels.stage import resnet_stage_fused_pallas, stack_stage_params
from winograd_tpu.utils.timing import bench_scan


def run(name: str, c_io: int, c_mid: int, hw: int, blocks: int, batch: int):
    cfg = BlockConfig(name, c_io=c_io, c_mid=c_mid, hw=hw, blocks=blocks, batch=batch)
    case = make_block_case(cfg, seed=32)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(case["x"]), dev)
    stacked = {
        k: jax.device_put(jnp.asarray(v), dev)
        for k, v in stack_stage_params(block_params_list(cfg, case)).items()
    }
    golden = np.asarray(case["golden"])

    variants = {
        "f32_stream": dict(precision="bf16x3", resident=False, mid_algo="direct"),
        "f32_resident": dict(precision="bf16x3", resident=True, mid_algo="direct"),
        "bf16w_stream": dict(precision="bf16w", resident=False, mid_algo="direct"),
        "bf16w_resident": dict(precision="bf16w", resident=True, mid_algo="direct"),
    }
    print(f"=== {name} N={batch} ===", file=sys.stderr)
    for vname, kw in variants.items():
        fn = lambda x_, kw=kw: resnet_stage_fused_pallas(x_, stacked, **kw)
        try:
            y = np.asarray(jax.block_until_ready(fn(x))).reshape(golden.shape)
        except Exception as e:  # resident layouts can VMEM-OOM at batch
            msg = str(e).splitlines()[0][:120]
            print(f"  {name} {vname}: FAILED ({msg})", file=sys.stderr)
            continue
        err = float(np.max(np.abs(y - golden)))
        rel = err / max(float(np.abs(golden).max()), 1.0)
        bound = 1e-4 if vname.startswith("f32") else 5e-3
        check = err if vname.startswith("f32") else rel
        assert check <= bound, (vname, err, rel)
        t = bench_scan(fn, x, scan_len=None)
        print(f"  {name} {vname}: device {t:.1f} us (err {err:.1e})", file=sys.stderr)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    run("conv5x_2blk", 2048, 512, 7, 2, batch)
    run("conv4x_5blk", 1024, 256, 14, 5, batch)

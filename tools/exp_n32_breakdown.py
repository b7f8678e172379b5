"""Mode-27 (ResNet-50, N=32) stage-level time breakdown — VERDICT r4 #2.

Times each serving segment of the COMPLETE classifier at batch 32 in
isolation (device scan-slope timing) per tier, so the whole-model number
decomposes into per-stage costs next to their weight-stream floors — the
report.pdf-Table-1 role for the serving-scale regime.

Usage: python tools/exp_n32_breakdown.py [--batch 32] [--out FILE]
Writes one JSON dict; the README/DESIGN narrative cites it.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.config import CASES
from winograd_tpu.utils.timing import bench_scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="N32_BREAKDOWN_r05.json")
    ap.add_argument("--tiers", default="f32,bf16w,int8")
    args = ap.parse_args()

    from winograd_tpu.datagen.generate import load_case
    from winograd_tpu.kernels.stem import stem_prepare_input
    from winograd_tpu.models.downsample import (
        downsample_bottleneck_block_pallas,
        projection_bottleneck_block_pallas,
        resnet50_stages,
    )
    from winograd_tpu.models.resnet50 import (
        head_pallas,
        quantize_resnet50,
        resnet50_params,
        stem_pallas,
        stem_pallas_pre,
    )

    cfg = CASES[27]
    mode = 27 if args.batch == 32 else 16
    import dataclasses

    if args.batch not in (1, 32):
        cfg = dataclasses.replace(CASES[27], batch=args.batch)
    elif args.batch == 1:
        cfg = CASES[16]
    from winograd_tpu.datagen.generate import make_resnet50_case

    case = make_resnet50_case(cfg, seed=0)
    params = resnet50_params(case, cfg)
    params = jax.device_put(jax.tree.map(jnp.asarray, params), jax.devices()[0])
    qparams = jax.device_put(quantize_resnet50(params), jax.devices()[0])
    x = jax.device_put(jnp.asarray(case["x"]), jax.devices()[0])

    rows = {"mode": mode, "batch": args.batch, "segments": {}}

    def seg(name, fn, arg, tier):
        us = bench_scan(fn, arg)
        rows["segments"].setdefault(name, {})[tier] = round(us, 2)
        print(f"  {name:<28} {tier:<6} {us:9.1f} us", file=sys.stderr)
        return jax.block_until_ready(jax.jit(fn)(arg))

    for tier in args.tiers.split(","):
        prec = None if tier == "f32" else tier
        print(f"== tier {tier}", file=sys.stderr)
        if tier == "int8":
            from winograd_tpu.kernels.quantized import (
                resnet_stage_int8_pallas,
                transition_block_int8_pallas,
            )
            from winograd_tpu.models.resnet50 import (
                _head_int8,
                _projection_block_int8,
            )

            h = seg("stem", lambda a: stem_pallas(a, qparams["stem"], "int8"), x, tier)
            h = seg("proj_entry", lambda a: _projection_block_int8(a, qparams["proj"]), h, tier)
            for si, st in enumerate(qparams["stages"]):
                if st.get("transition") is not None:
                    h = seg(
                        f"transition_{si}",
                        lambda a, st=st: transition_block_int8_pallas(a, st["transition"]),
                        h, tier,
                    )
                h = seg(
                    f"stage_{si}",
                    lambda a, st=st: resnet_stage_int8_pallas(a, st["blocks"]),
                    h, tier,
                )
            seg("head", lambda a: _head_int8(a, qparams["head"]), h, tier)
        else:
            xp = jax.block_until_ready(stem_prepare_input(x))
            hw_img = int(x.shape[-3])
            seg(
                "stem_pre",
                lambda a: stem_pallas_pre(a, params["stem"], prec, h=hw_img, w=hw_img),
                xp, tier,
            )
            h = seg("stem", lambda a: stem_pallas(a, params["stem"], prec), x, tier)
            h = seg(
                "proj_entry",
                lambda a: projection_bottleneck_block_pallas(a, params["proj"], prec),
                h, tier,
            )
            for si, st in enumerate(params["stages"]):
                if st.get("transition") is not None:
                    h = seg(
                        f"transition_{si}",
                        lambda a, st=st: downsample_bottleneck_block_pallas(
                            a, st["transition"], precision=prec
                        ),
                        h, tier,
                    )
                h = seg(
                    f"stage_{si}",
                    lambda a, st=st: resnet50_stages(
                        a, [{"transition": None, "blocks": st["blocks"]}],
                        precision=prec,
                    ),
                    h, tier,
                )
            seg("head", lambda a: head_pallas(a, params["head"], prec), h, tier)

    # stem_pre is the ALTERNATIVE stem route (preprocessed-input contract),
    # not an extra segment — totals sum the raw-stem decomposition only.
    totals = {
        t: round(
            sum(
                v[t]
                for name, v in rows["segments"].items()
                if t in v and name != "stem_pre"
            ),
            1,
        )
        for t in args.tiers.split(",")
    }
    rows["segment_totals_us"] = totals
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(totals), file=sys.stderr)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

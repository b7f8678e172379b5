"""Render the README performance table from a full-sweep artifact.

Usage: python tools/bench_table.py BENCH_FULL_r03.json

Keeps the README honest: round 2 shipped a hand-extended table whose rows
were not all in the artifact it cited; generating the rows from the JSON
makes that impossible.
"""

from __future__ import annotations

import json
import sys

# Reference TITAN X numbers (BASELINE.md) for the six reference modes.
REF_US = {0: 59, 1: 117, 2: 58, 3: 55, 4: 186, 5: 181}


def fmt(v, nd=2):
    if v is None:
        return "—"
    return f"{v:.{nd}f}" if v < 100 else f"{v:.1f}"


def main(path: str) -> int:
    with open(path) as f:
        rows = json.load(f)
    print(
        "| Mode | Case | Pallas f32 (µs) | bf16w (µs) | int8 (µs) | MFU | "
        "XLA f32 (µs) | ref CUDA (µs) | max err |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        m = r["mode"]
        extra = ""
        if r.get("direct_device_us") is not None:
            extra = (
                f" (direct {fmt(r['direct_device_us'], 1)}; "
                f"F(4,3) {fmt(r['winograd_f43_device_us'], 1)})"
            )
        mfu = f"{100 * r['mfu_pallas']:.1f}%" if r.get("mfu_pallas") else "—"
        print(
            f"| {m} | {r['name']} | **{fmt(r['pallas_device_us'])}**{extra} "
            f"| {fmt(r.get('bf16w_device_us'))} "
            f"| {fmt(r.get('int8_device_us'))} "
            f"| {mfu} "
            f"| {fmt(r['xla_device_us'])} "
            f"| {REF_US.get(m, '—')} "
            f"| {r['max_error_pallas']:.1e} |"
        )
    # Throughput footnotes the prose cites (stderr, not part of the table).
    tp = {
        r["mode"]: (r.get("throughput_im_s"), r.get("throughput_int8_im_s"))
        for r in rows
    }
    for m in sorted(tp):
        if tp[m][0]:
            print(f"mode {m}: {tp[m][0]} im/s f32, {tp[m][1]} im/s int8", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))

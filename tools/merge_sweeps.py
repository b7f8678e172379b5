"""Merge bench sweep resume files into one full artifact.

Usage: python tools/merge_sweeps.py OUT.json IN1.json IN2.json ...

The round-5 sweep ran as two concurrent mode-partitioned streams (the
stable modes, and the modes whose kernels changed mid-round) to fit the
TPU wall-clock budget; each stream checkpointed its own --resume file.
This merges them, refuses rows that failed parity or overlap with
conflicting settings, and asserts the result covers EVERY registered mode
(the round-2 'full artifact missing its newest mode' failure shape).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from winograd_tpu.config import CASES  # noqa: E402


def main(argv):
    if len(argv) < 3:
        raise SystemExit(__doc__)
    out_path, ins = argv[1], argv[2:]
    by_mode = {}
    for path in ins:
        for r in json.load(open(path)):
            if not r.get("parity_ok"):
                raise SystemExit(f"{path}: mode {r['mode']} has parity_ok=false")
            # Rows measured before bench_scan hard-failed on non-positive
            # slopes can carry a bogus negative latency (r05 stream-b
            # mode 24 bf16w: -82 µs). A later input may override the row;
            # a negative slope must never survive into the merged artifact.
            bad = {
                k: v
                for k, v in r.items()
                if k.endswith("_device_us") and v is not None and v <= 0
            }
            if bad:
                r = {**r, "_bad_slopes": bad}
            prev = by_mode.get(r["mode"])
            if prev is not None and (
                prev.get("bench_iterations") != r.get("bench_iterations")
                or prev.get("bench_seed") != r.get("bench_seed")
            ):
                raise SystemExit(
                    f"mode {r['mode']}: conflicting settings across inputs"
                )
            by_mode[r["mode"]] = r
    missing = sorted(set(CASES) - set(by_mode))
    if missing:
        raise SystemExit(f"merged sweep INCOMPLETE: missing modes {missing}")
    poisoned = {m: r["_bad_slopes"] for m, r in by_mode.items() if "_bad_slopes" in r}
    if poisoned:
        raise SystemExit(
            f"non-positive timing slopes survived the merge: {poisoned} — "
            "re-measure those modes (bench_scan now hard-fails them at source)"
        )
    rows = [by_mode[m] for m in sorted(by_mode)]
    with open(out_path, "w") as f:
        json.dump(rows, f)
    print(f"wrote {out_path}: {len(rows)} modes, all parity_ok")


if __name__ == "__main__":
    main(sys.argv)

#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line.

Headline metric: mean fused 3x3 Winograd+BN+ReLU 128->128 latency (the
reference's flagship case, 59 us on TITAN X — BASELINE.md). vs_baseline is
the ratio of our latency to that 59 us number (<1.0 means faster than the
reference's hand-tuned CUDA kernel on its own hardware).
"""

import json
import os
import sys
import threading

REFERENCE_US = 59.0  # custom CUDA kernel, mode 0 (/root/reference/README.md:27)

_done = threading.Event()


def _watchdog():
    # A down axon tunnel makes device ops HANG inside a C++ PJRT wait
    # rather than fail (see .claude/skills/verify/SKILL.md) — a blocked
    # main thread never reaches a bytecode boundary, so a SIGALRM handler
    # would not run. A daemon thread + os._exit does: a warm mode-0 run
    # takes ~80 s and a cold-cache one minutes, so 20 min without a result
    # means the TPU is unreachable — exit with a diagnosis, not a hang.
    if not _done.wait(20 * 60):
        print("bench.py: no result after 20 min — axon tunnel down?", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)


def main() -> int:
    threading.Thread(target=_watchdog, daemon=True).start()
    from winograd_tpu.bench.cli import run_case

    # scan_len=None sizes the timing legs adaptively to ~0.5 s of device
    # work each (utils/timing.py::bench_scan), so the tunnel's per-call RTT
    # jitter (~ms) perturbs the slope by well under 1%.
    r = run_case(0, iterations=100, warmup=2, strict=True, scan_len=None)
    # Steady-state per-op device latency (scan-slope protocol,
    # utils/timing.py) — comparable to the reference's timed region, which
    # excludes transfers and brackets only kernel launches + one sync. The
    # framework ships three fused 3x3 algorithms (winograd F(2,3) — the
    # flagship "pallas" path and fastest measured — plus F(4,3) and direct
    # im2col GEMM, selected like cuDNN's algo enum); the headline is the
    # best one, all parity-checked against the float64 golden model.
    _done.set()
    candidates = [r["pallas_device_us"]]
    for key in ("direct_device_us", "winograd_f43_device_us"):
        if r.get(key) is not None:
            candidates.append(r[key])
    value = min(candidates)
    print(
        json.dumps(
            {
                "metric": "winograd3x3_128_fused_latency",
                "value": round(value, 2),
                "unit": "us",
                "vs_baseline": round(value / REFERENCE_US, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

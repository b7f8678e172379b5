#!/bin/bash
# Round-5 full-sweep driver: every mode through the hard-parity bench,
# checkpointed per mode into BENCH_FULL_r05.json (the CLI's --resume
# contract re-runs only modes missing or failed under the same settings).
# Invoked per mode-group so kernel work landing mid-round can re-run just
# the affected modes (delete their rows first) without restarting the rest.
set -u
cd /root/repo
RESUME=${RESUME:-/root/repo/BENCH_FULL_r05.json}
for m in "$@"; do
  echo "=== sweep mode $m start $(date -u +%H:%M:%S) ==="
  timeout 5400 python -m winograd_tpu.bench "$m" --resume "$RESUME" --json
  echo "=== sweep mode $m exit $? at $(date -u +%H:%M:%S) ==="
done

#!/bin/bash
# Park against the tunnel: probe compute+fetch every PROBE_EVERY seconds
# (wall-clock-tracked via $SECONDS, ADVICE r4 #3) until it answers or
# PARK_BUDGET elapses.  On success touches /tmp/tpu_up and exits 0.
set -u
cd "$(cd "$(dirname "$0")/.." && pwd)"
PROBE_EVERY="${RLMG_PROBE_EVERY:-300}"
PARK_BUDGET="${RLMG_PARK_BUDGET:-21600}"
rm -f /tmp/tpu_up
SECONDS=0
while true; do
  if python scripts/tpu_probe.py 240 > /tmp/tpu_probe_last.log 2>&1; then
    echo "[park] backend UP after ${SECONDS}s $(date -u +%H:%M:%S)"
    touch /tmp/tpu_up
    exit 0
  fi
  if [ "$SECONDS" -ge "$PARK_BUDGET" ]; then
    echo "[park] backend still down after ${SECONDS}s wall; giving up"
    exit 1
  fi
  echo "[park] down; re-probe in ${PROBE_EVERY}s (elapsed ${SECONDS}s, $(date -u +%H:%M:%S))"
  sleep "$PROBE_EVERY"
done

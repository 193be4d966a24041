#!/bin/bash
# Follow-up on-chip jobs queued BEHIND scripts/onchip_queue.sh: waits for
# the main queue process to exit, then (if the backend answers) runs the
# measurement jobs added later in round 4.  Same bounded-probe discipline
# (backend init HANGS during an outage — every probe is a subprocess with
# a timeout).
#
# Usage: setsid nohup scripts/onchip_followup.sh <queue_pid> \
#          > /tmp/onchip_followup.log 2>&1 &

set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${RLMG_ONCHIP_OUT:-/tmp/r4_onchip}"
QPID="${1:-}"
mkdir -p "$OUT"
cd "$REPO"

if [ -n "$QPID" ]; then
  echo "[followup] waiting for queue pid $QPID $(date -u +%H:%M:%S)"
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
  echo "[followup] queue exited $(date -u +%H:%M:%S)"
fi

# one bounded probe: only run if the backend is actually up
if ! timeout 240 python -c "
import jax
d = jax.devices()
print('UP' if jax.default_backend() in ('tpu', 'axon') else 'CPU')
" 2>/dev/null | grep -q UP; then
  echo "[followup] backend down; skipping follow-up jobs"
  exit 1
fi

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "[followup] >>> $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "[followup] <<< $name rc=$? $(date -u +%H:%M:%S)"
  tail -5 "$OUT/$name.log"
}

# continuous-vs-synchronous serving A/B (generate/serving.py, r4)
run_job serving_ab 7200 python scripts/profile_serving.py all

echo "[followup] done $(date -u +%H:%M:%S)"

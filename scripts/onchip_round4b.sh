#!/bin/bash
# Second round-4 on-chip pass: jobs fixed or added after the first
# queue drained (v7 pe-slab block-spec fix, prompt-timing fetch fix,
# qkv op-level anomaly trace, step-A/B variance reps).
#
# Same bounded-probe discipline as onchip_queue.sh: backend init HANGS
# during a tunnel outage, so every device-touching step is a subprocess
# under `timeout`.
#
# Usage: bash scripts/onchip_round4b.sh   (logs to /tmp/r4_onchip)

set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${RLMG_ONCHIP_OUT:-/tmp/r4_onchip}"
mkdir -p "$OUT"
cd "$REPO"

# Probe must exercise the COMPUTE+FETCH path, not just device listing:
# a wedged backend still answers jax.devices() while every real fetch
# hangs (observed 2026-08-19 after a client was killed mid-flight).
# Parked mode: probe every PROBE_EVERY seconds up to PARK_BUDGET total.
PROBE_EVERY="${RLMG_PROBE_EVERY:-180}"
PARK_BUDGET="${RLMG_PARK_BUDGET:-14400}"
waited=0
probe() {
  timeout 240 python -c "
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() in ('tpu', 'axon')
x = jnp.ones((128, 128), jnp.bfloat16)
v = np.asarray((x @ x)[..., :1])
print('UP')
" 2>/dev/null | grep -q UP
}
until probe; do
  if [ "$waited" -ge "$PARK_BUDGET" ]; then
    echo "[r4b] backend still down after ${waited}s; exiting"
    exit 1
  fi
  echo "[r4b] backend down/wedged; re-probe in ${PROBE_EVERY}s ($(date -u +%H:%M:%S))"
  sleep "$PROBE_EVERY"
  waited=$((waited + PROBE_EVERY))
done
echo "[r4b] backend UP $(date -u +%H:%M:%S)"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "[r4b] >>> $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "[r4b] <<< $name rc=$? $(date -u +%H:%M:%S)"
  tail -5 "$OUT/$name.log"
}

# v7 weight-resident latency kernel, with the pe-slab block-spec fix
run_job latency_v7_rate2 5400 python scripts/profile_decode_latency.py rate
run_job latency_v7_songs2 5400 python scripts/profile_decode_latency.py songs
# prompt A/B with the reps+fetch timing protocol
run_job latency_prompt2 5400 python scripts/profile_decode_latency.py prompt
# qkv step A/B variance: two more independent passes
run_job attn_step_ab2 9000 python scripts/profile_attention_block.py
run_job attn_step_ab3 9000 python scripts/profile_attention_block.py
# device trace of the op-level kernel grad (the 47 ms anomaly)
run_job attn_optrace 5400 python scripts/profile_attention_block.py optrace 128

echo "[r4b] all done $(date -u +%H:%M:%S)"

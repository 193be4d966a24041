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

if ! timeout 240 python -c "
import jax
print('UP' if jax.default_backend() in ('tpu', 'axon') else 'CPU')
" 2>/dev/null | grep -q UP; then
  echo "[r4b] backend down; exiting"
  exit 1
fi

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

#!/bin/bash
# On-chip job queue for the tunneled TPU: probe until the backend
# responds, then run the queued measurement jobs sequentially.
#
# The tunneled axon platform goes UNAVAILABLE for stretches, and backend
# init HANGS (not fails) during an outage — so every probe is a bounded
# subprocess, and the queue only starts after one clean device query.
# Logs land in $OUT (default /tmp/r4_onchip).
#
# Usage: scripts/onchip_queue.sh [probe_hours]
#   then: setsid nohup scripts/onchip_queue.sh > /tmp/onchip_queue.log 2>&1 &

set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${RLMG_ONCHIP_OUT:-/tmp/r4_onchip}"
HOURS="${1:-8}"
ATTEMPTS=$((HOURS * 12))          # one probe every ~5 min
mkdir -p "$OUT"
cd "$REPO"

echo "[queue] probing backend (budget ${HOURS}h) $(date -u +%H:%M:%S)"
up=0
for i in $(seq 1 "$ATTEMPTS"); do
  if timeout 240 python -c "
import jax
d = jax.devices()
if jax.default_backend() in ('tpu', 'axon'):
    print('TPU-UP', d)
else:
    print('CPU-FALLBACK', d)
" 2>/dev/null | grep -q TPU-UP; then
    echo "[queue] backend up at attempt $i $(date -u +%H:%M:%S)"
    up=1
    break
  fi
  echo "[queue] attempt $i down $(date -u +%H:%M:%S)"
  sleep 300
done
if [ "$up" != 1 ]; then
  echo "[queue] backend never came up; exiting"
  exit 1
fi

run_job() {  # name, timeout_s, cmd...
  local name="$1" tmo="$2"; shift 2
  echo "[queue] >>> $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "[queue] <<< $name rc=$rc $(date -u +%H:%M:%S)"
  tail -5 "$OUT/$name.log"
}

# 1. op-level fwd+bwd: fused qkv+attention kernel vs XLA composition
run_job attn_op_c128 5400 python scripts/profile_attention_block.py op 128
# 2. full train step A/B (bench_pretrain protocol, subprocess per mode)
run_job attn_step_ab 9000 python scripts/profile_attention_block.py
# 2b. device trace WITH the fused qkv kernel: locates the next wall
run_job trace_qkv 5400 env RLMG_ATTN_BACKEND=pallas-qkv python scripts/trace_pretrain.py
# 3. v7 weight-resident latency kernel A/B at B in {1,8,16} + 5-songs
run_job latency_v7_rate 5400 python scripts/profile_decode_latency.py rate
run_job latency_v7_songs 5400 python scripts/profile_decode_latency.py songs
# 3b. prompt-ingestion A/B: parallel prefill vs sequential scan
run_job latency_prompt 5400 python scripts/profile_decode_latency.py prompt
# 4. full bench (decode + pretrain + RL fields) with current defaults
run_job bench 7200 python bench.py

echo "[queue] all jobs done $(date -u +%H:%M:%S)"

#!/bin/bash
# Round-5 on-chip queue, part 1: land the two parked round-4 decisions
# (VERDICT r4 Missing #1/#2).  Probe is the wedge-safe in-Python-deadline
# probe (scripts/tpu_probe.py, ADVICE r4 #3); jobs are bounded by an
# in-Python deadline (scripts/with_deadline.py) and allowed to EXPIRE
# with a grace period (never signaled mid-flight from outside).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${RLMG_ONCHIP_OUT:-/tmp/r5_onchip}"
mkdir -p "$OUT"
cd "$REPO"

# park until the backend answers (shared probe-park policy;
# ADVICE r5: one implementation in scripts/park_probe.sh)
RLMG_PARK_BUDGET="${RLMG_PARK_BUDGET:-14400}" \
  bash scripts/park_probe.sh || { echo "[r5] backend down; exiting"; exit 1; }
echo "[r5] backend UP $(date -u +%H:%M:%S)"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "[r5] >>> $name start $(date -u +%H:%M:%S)"
  # in-Python deadline (scripts/with_deadline.py): a slow job gets a
  # grace period to finish its fetch; never SIGTERMed mid-flight
  local prog="$1"; shift
  [ "$prog" = python ] || { echo "run_job expects python jobs"; return 2; }
  python scripts/with_deadline.py "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "[r5] <<< $name rc=$? $(date -u +%H:%M:%S)"
  tail -4 "$OUT/$name.log"
}

# qkv step A/B variance: two more independent passes (decision: flip or final negative)
run_job attn_step_ab2 5400 python scripts/profile_attention_block.py
run_job attn_step_ab3 5400 python scripts/profile_attention_block.py
# prompt prefill A/B with the rep-chained fetch-forced protocol
run_job latency_prompt2 5400 python scripts/profile_decode_latency.py prompt
# device trace of the op-level kernel grad (the 47 ms anomaly)
run_job attn_optrace 3600 python scripts/profile_attention_block.py optrace 128
echo "[r5] part1 done $(date -u +%H:%M:%S)"

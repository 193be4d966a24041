#!/bin/bash
# Round-5 on-chip queue, part 2: the v8 one-program-per-token latency
# A/B (VERDICT r4 next #1), the AIRL re-scoring batch sweep (#6), and
# the serving SLO table (#4).  Same wedge-safe discipline as part 1.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${RLMG_ONCHIP_OUT:-/tmp/r5_onchip}"
mkdir -p "$OUT"
cd "$REPO"

# park until the backend answers (shared probe-park policy;
# ADVICE r5: one implementation in scripts/park_probe.sh)
RLMG_PARK_BUDGET="${RLMG_PARK_BUDGET:-14400}" \
  bash scripts/park_probe.sh || { echo "[r5b] backend down; exiting"; exit 1; }
echo "[r5b] backend UP $(date -u +%H:%M:%S)"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "[r5b] >>> $name start $(date -u +%H:%M:%S)"
  # in-Python deadline (scripts/with_deadline.py): a slow job gets a
  # grace period to finish its fetch; never SIGTERMed mid-flight
  local prog="$1"; shift
  [ "$prog" = python ] || { echo "run_job expects python jobs"; return 2; }
  python scripts/with_deadline.py "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "[r5b] <<< $name rc=$? $(date -u +%H:%M:%S)"
  tail -8 "$OUT/$name.log"
}

# v8 vs v7/v6/v4/xla: B in {1,8,32,128} rate + the 5-songs scenario
run_job latency_v8_rate 5400 python scripts/profile_decode_latency.py rate
run_job latency_v8_songs 5400 python scripts/profile_decode_latency.py songs
# AIRL 20k-buffer re-scoring batch sweep
run_job airl_score_sweep 5400 python scripts/profile_airl_score.py
# serving SLO: mixed prompt-length workload through serve_requests
run_job serving_slo 5400 python scripts/profile_serving_slo.py
echo "[r5b] part2 done $(date -u +%H:%M:%S)"

#!/bin/bash
# Final pass: criterion (fixed in-range witness), northstar (chunked
# transforms), re-measured NTT (fenced) + msm 2^13 (lane-axis layout).
set -u
cd /root/repo
OUT=BENCH_NUMBERS.jsonl
run() {
  local metric="$1"; shift
  if [ -f "$OUT" ] && grep -q "\"metric\": \"$metric\"" "$OUT"; then
    echo "=== skip (recorded): $metric" >> bench_campaign.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) $*" >> bench_campaign.log
  "$@" python bench_suite.py >> "$OUT" 2>> bench_campaign.log
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> bench_campaign.log
}
run "criterion_verify_k13" env BENCH_STAGES=criterion
run "northstar_verify_k17" env BENCH_STAGES=northstar
run "msm_pippenger_2^13x4" env BENCH_STAGES=msm BENCH_MSM_LOG2=13
run "ntt_2^13" env BENCH_STAGES=ntt BENCH_NTT_LOG2=13
run "ntt_2^15" env BENCH_STAGES=ntt BENCH_NTT_LOG2=15
run "ntt_2^17" env BENCH_STAGES=ntt BENCH_NTT_LOG2=17
echo "CAMPAIGN3 DONE $(date -u +%H:%M:%S)" >> bench_campaign.log
python scripts/bench_numbers_md.py >> bench_campaign.log 2>&1 || true

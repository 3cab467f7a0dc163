#!/bin/bash
# Continuation campaign, reprioritized: the reference criterion config and
# the BASELINE north-star run FIRST (they are the round's scored
# deliverables), the remaining kernel shapes after. Same contract as
# run_bench_campaign.sh: one stage per process, skip-if-recorded, append
# to BENCH_NUMBERS.jsonl. Stages serialize on the TPU flock, so this can
# be launched while a previous stage still owns the tunnel.
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
run "msm_pippenger_2^15x4" env BENCH_STAGES=msm BENCH_MSM_LOG2=15
run "ntt_2^15" env BENCH_STAGES=ntt BENCH_NTT_LOG2=15
run "msm_pippenger_2^17x4" env BENCH_STAGES=msm BENCH_MSM_LOG2=17
run "ntt_2^17" env BENCH_STAGES=ntt BENCH_NTT_LOG2=17
run "mst_build_2^16" env BENCH_STAGES=build BENCH_TREE_LOG2=16
run "prove_batch_throughput_k11" env BENCH_STAGES=keygen,batch_throughput BENCH_USERS=8
echo "CAMPAIGN2 DONE $(date -u +%H:%M:%S)" >> bench_campaign.log
python scripts/bench_numbers_md.py >> bench_campaign.log 2>&1 || true

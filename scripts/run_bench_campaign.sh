#!/bin/bash
# North-star bench campaign (VERDICT r2 #1 / r3 #2): run every bench_suite
# stage on the real TPU, sequentially, ONE process on the tunnel at a
# time, appending JSON lines to BENCH_NUMBERS.jsonl. Each phase is its
# own process so an OOM in one stage doesn't kill the rest; stages whose
# headline metric is already recorded are skipped, so the campaign is
# resumable (rerun the script after a crash and it continues where it
# stopped). Delete the metric's line from BENCH_NUMBERS.jsonl to force a
# re-measure.
set -u
cd /root/repo
OUT=BENCH_NUMBERS.jsonl
run() { # run <metric-to-skip-on> <env...>
  local metric="$1"; shift
  if [ -f "$OUT" ] && grep -q "\"metric\": \"$metric\"" "$OUT"; then
    echo "=== skip (recorded): $metric" >> bench_campaign.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) $*" >> bench_campaign.log
  "$@" python bench_suite.py >> "$OUT" 2>> bench_campaign.log
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> bench_campaign.log
}

# phase 1: cheap single-process sweep — msm/ntt at k=13, k=11 pipeline
run "msm_pippenger_2^13x4" env BENCH_STAGES=msm,ntt BENCH_MSM_LOG2=13 BENCH_NTT_LOG2=13
run "prove_throughput_k11" env BENCH_STAGES=keygen,prove,verify,throughput BENCH_USERS=8
run "prove_batch_throughput_k11" env BENCH_STAGES=keygen,batch_throughput BENCH_USERS=8
# phase 2: larger msm/ntt shapes
run "msm_pippenger_2^15x4" env BENCH_STAGES=msm BENCH_MSM_LOG2=15
run "ntt_2^15" env BENCH_STAGES=ntt BENCH_NTT_LOG2=15
run "msm_pippenger_2^17x4" env BENCH_STAGES=msm BENCH_MSM_LOG2=17
run "ntt_2^17" env BENCH_STAGES=ntt BENCH_NTT_LOG2=17
# phase 3: device tree build at 2^16 entries
run "mst_build_2^16" env BENCH_STAGES=build BENCH_TREE_LOG2=16
# phase 4: the reference criterion config (2^20 tree, k=13 pipeline)
run "criterion_verify_k13" env BENCH_STAGES=criterion
# phase 5: the north star (2^16 entries, k=17 e2e)
run "northstar_verify_k17" env BENCH_STAGES=northstar
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> bench_campaign.log
python scripts/bench_numbers_md.py >> bench_campaign.log 2>&1 || true

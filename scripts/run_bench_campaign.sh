#!/bin/bash
# North-star bench campaign (VERDICT r2 item #1): run every bench_suite
# stage on the real TPU, sequentially, ONE process on the tunnel at a
# time, appending JSON lines to BENCH_NUMBERS.jsonl. Each phase is its
# own process so an OOM in one stage doesn't kill the rest.
set -u
cd /root/repo
OUT=BENCH_NUMBERS.jsonl
run() { # name, env..., then python runs bench_suite with BENCH_STAGES
  echo "=== $(date -u +%H:%M:%S) $*" >> bench_campaign.log
  "$@" python bench_suite.py >> "$OUT" 2>> bench_campaign.log
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> bench_campaign.log
}

# phase 1: cheap single-process sweep — msm/ntt at k=13, k=11 pipeline
run env BENCH_STAGES=msm,ntt BENCH_MSM_LOG2=13 BENCH_NTT_LOG2=13
run env BENCH_STAGES=keygen,prove,verify,throughput,batch_throughput BENCH_USERS=8
# phase 2: larger msm/ntt shapes
run env BENCH_STAGES=msm BENCH_MSM_LOG2=15
run env BENCH_STAGES=ntt BENCH_NTT_LOG2=15
run env BENCH_STAGES=msm BENCH_MSM_LOG2=17
run env BENCH_STAGES=ntt BENCH_NTT_LOG2=17
# phase 3: device tree build at 2^16 entries
run env BENCH_STAGES=build BENCH_TREE_LOG2=16
# phase 4: the reference criterion config (2^20 tree, k=13 pipeline)
run env BENCH_STAGES=criterion
# phase 5: the north star (2^16 entries, k=17 e2e)
run env BENCH_STAGES=northstar
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> bench_campaign.log

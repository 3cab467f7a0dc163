"""Render BENCH_NUMBERS.jsonl (TPU bench campaign output) into
BENCH_NUMBERS.md — the in-tree north-star performance record demanded by
BASELINE.md (reference bench surface:
/root/reference/zk_prover/benches/full_solvency_flow.rs:88-116)."""

import json
import os
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference anchors (BASELINE.md): measured on the 4-core host in-tree,
# 64-core estimates scaled from the reference's published criterion runs.
REF_NOTES = {
    "msm_pippenger": "halo2curves CPU Pippenger (BASELINE.md §MSM)",
    "ntt": "halo2 best_fft (BASELINE.md §NTT)",
    "criterion": "reference criterion config LEVELS=20,k=13",
    "northstar": "BASELINE.md north-star: 2^16 entries, k=17",
}


def main():
    by_metric = {}
    with open(os.path.join(HERE, "BENCH_NUMBERS.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                r = json.loads(line)
                # re-measured metrics (resumed campaigns) keep the latest row
                by_metric[r["metric"]] = r
    rows = list(by_metric.values())
    # NEVER probe jax.devices() here: this renderer runs while the bench
    # campaign owns the axon tunnel, and a second client can wedge it.
    dev = os.environ.get("BENCH_HW", "TPU v5 lite (single chip, axon tunnel)")
    date = time.strftime("%Y-%m-%d")
    out = [
        "# North-star benchmark numbers (measured in-tree)",
        "",
        f"Hardware: {dev}. Date: {date}.",
        "Produced by `bash scripts/run_bench_campaign.sh` -> "
        "`BENCH_NUMBERS.jsonl` (raw lines, committed alongside).",
        "All times are steady-state (post-compile) unless marked cold.",
        "",
        "| metric | value | unit | detail |",
        "|---|---|---|---|",
    ]
    for r in rows:
        extra = {
            k: v for k, v in r.items() if k not in ("metric", "value", "unit")
        }
        det = ", ".join(f"{k}={v}" for k, v in extra.items())
        out.append(f"| {r['metric']} | {r['value']} | {r['unit']} | {det} |")
    out.append("")
    with open(os.path.join(HERE, "BENCH_NUMBERS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote BENCH_NUMBERS.md ({len(rows)} rows)")


if __name__ == "__main__":
    main()

"""Criterion-equivalent benchmark suite.

Mirrors the reference's bench set (`zk_prover/benches/full_solvency_flow.rs`,
SURVEY §6): Merkle-sum-tree build (device-resident path), keygen (vk+pk),
proof generation, proof verification (+ proof size). One JSON line per
stage. Select stages with BENCH_STAGES=build,keygen,prove,verify and tree
size with BENCH_TREE_LOG2 (default 16).

The driver's headline bench stays in bench.py (single JSON line).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from circuits_halo2_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def emit(metric, value, unit, extra=None):
    line = {"metric": metric, "value": round(value, 3), "unit": unit}
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)


def bench_build(log2_leaves: int):
    import numpy as np

    from circuits_halo2_tpu.merkle.device_tree import build_device_tree

    n = 1 << log2_leaves
    rng = np.random.default_rng(0)
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    balances = rng.integers(0, 1 << 48, size=(n, 2), dtype=np.uint64)

    use_pallas = os.environ.get("JAX_PLATFORMS", "") != "cpu"
    # warm-up run: Mosaic kernels compile per process (the remote compile
    # service is not covered by the persistent cache)
    build_device_tree(digests, balances, use_pallas=use_pallas).root()
    t0 = time.perf_counter()
    tree = build_device_tree(digests, balances, use_pallas=use_pallas)
    root = tree.root()
    dt = time.perf_counter() - t0
    total_hashes = 2 * n - 1
    emit(
        f"mst_build_2^{log2_leaves}",
        dt,
        "s",
        {"hashes_per_sec": round(total_hashes / dt, 1)},
    )
    return root


def _setup():
    from circuits_halo2_tpu.utils import pipeline

    here = os.path.dirname(os.path.abspath(__file__))
    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(
        11, os.path.join(here, "tests/fixtures_ptau_hermez-raw-11"), 4, 2, 8
    )
    emit("keygen_vk_pk_k11", time.perf_counter() - t0, "s")
    return art


def main():
    stages = os.environ.get("BENCH_STAGES", "build,keygen,prove,verify").split(",")
    log2 = int(os.environ.get("BENCH_TREE_LOG2", 16))

    if "build" in stages:
        bench_build(log2)

    if not ({"keygen", "prove", "verify"} & set(stages)):
        return
    art = _setup()

    from circuits_halo2_tpu.merkle.mst import MerkleSumTree
    from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
    from circuits_halo2_tpu.utils import pipeline

    here = os.path.dirname(os.path.abspath(__file__))
    tree = MerkleSumTree.from_csv(
        os.path.join(here, "tests/fixtures_csv/entry_16.csv")
    )
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()

    proof = None
    if "prove" in stages:
        t0 = time.perf_counter()
        proof = pipeline.full_prover(art, circuit, instances)
        emit(
            "prove_mst_inclusion_k11",
            time.perf_counter() - t0,
            "s",
            {"proof_bytes": len(proof)},
        )

    if "verify" in stages and proof is not None:
        t0 = time.perf_counter()
        ok = pipeline.full_verifier(art, proof, instances)
        emit("verify_mst_inclusion_k11", time.perf_counter() - t0, "s", {"ok": ok})


if __name__ == "__main__":
    main()

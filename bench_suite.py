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

# NOTE: jaxcache.enable() initializes the jax backend, which CONNECTS THE
# AXON TUNNEL — it must happen only after the tpulock is held (a second
# connected client starves/deadlocks the one doing work), so it lives in
# main() after lock acquisition, not at import time.


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

    # sorted variant (`benches/full_solvency_flow.rs:35-50`): host argsort
    # over usernames + the same device build (kernels already warm)
    from circuits_halo2_tpu.merkle.device_tree import build_device_tree_sorted

    usernames = rng.integers(0, 256, size=(n, 8), dtype=np.uint8).view("S8")[:, 0]
    t0 = time.perf_counter()
    stree, _ = build_device_tree_sorted(
        usernames, digests, balances, use_pallas=use_pallas
    )
    stree.root()
    emit(f"mst_build_sorted_2^{log2_leaves}", time.perf_counter() - t0, "s")
    return root


def bench_msm(log2_points: int):
    """North-star metric: MSM points/sec on device (BASELINE.md §north-star).

    Measures the batched device Pippenger over a random base set (the SRS
    case: bases fixed, device-resident Montgomery scalar columns — the
    prover's msm_commit_dev call). Excludes base precompute and scalar
    placement; includes device digit extraction and the result fetch.
    """
    import random

    import numpy as np

    from circuits_halo2_tpu.ops import curve as C
    from circuits_halo2_tpu.ops import field as F
    from circuits_halo2_tpu.ops import msm as M

    import jax.numpy as jnp

    from circuits_halo2_tpu.ops import field_jax as FJ

    n = 1 << log2_points
    rng = random.Random(7)
    # distinct small multiples are as good as random points for timing and
    # far cheaper to generate host-side
    base = [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(64)]
    points = [base[i % 64] for i in range(n)]
    nbatch = int(os.environ.get("BENCH_MSM_BATCH", 4))
    rows = [[rng.randrange(F.FR_MOD) for _ in range(n)] for _ in range(nbatch)]
    M.precompute_bases(points)

    # production path: the prover hands msm_commit_dev DEVICE-RESIDENT
    # Montgomery scalar columns (models/prover phase commits), so scalars
    # are placed on device outside the timed window — the measurement is
    # device digit extraction + Pippenger + result fetch, exactly the
    # per-commitment cost inside a proof. (The previous form re-uploaded
    # ~67 MB of host-side digits through the tunnel every call at 2^17x4,
    # timing the link, not the chip.)
    scal_mont = jnp.asarray(
        np.stack(
            [FJ.ints_to_limbs([(s << 256) % F.FR_MOD for s in row]) for row in rows],
            axis=1,
        )
    )  # (16, B, n)
    res = M.msm_commit_dev(points, scal_mont)  # compile + warm
    t0 = time.perf_counter()
    res = M.msm_commit_dev(points, scal_mont)
    dt = time.perf_counter() - t0
    emit(
        f"msm_pippenger_2^{log2_points}x{nbatch}",
        dt,
        "s",
        {"points_per_sec": round(n * nbatch / dt, 1)},
    )
    # spot-check one row against the host Pippenger (small prefix identity
    # would not exercise the device path; full row is too slow on host for
    # big n, so check at n <= 4096 only)
    if n <= 4096:
        assert res[0] == C.g1_msm_pippenger(points, rows[0]), "device/host MSM mismatch"


def bench_ntt(log2_n: int):
    """North-star metric: NTT butterflies/sec on device."""
    import random

    import jax
    import numpy as np

    from circuits_halo2_tpu.ops import field as F
    from circuits_halo2_tpu.ops import field_jax as FJ
    from circuits_halo2_tpu.ops import ntt as NTT

    n = 1 << log2_n
    rng = random.Random(11)
    omega = NTT.omega_for_k(log2_n)
    vals = [rng.randrange(F.FR_MOD) for _ in range(n)]
    a = jax.numpy.asarray(FJ.ints_to_limbs([(v << 256) % F.FR_MOD for v in vals]))
    out = NTT.ntt(a, omega)
    np.asarray(out[:, :1])  # materialize: block_until_ready does NOT
    # fence remote axon execution (PROGRESS.md pitfalls) — the earlier
    # 0.0s ntt rows measured dispatch time only
    iters = int(os.environ.get("BENCH_NTT_ITERS", 8))
    t0 = time.perf_counter()
    x = a
    for _ in range(iters):
        x = NTT.ntt(x, omega)
    np.asarray(x[:, :1])
    dt = time.perf_counter() - t0
    butterflies = (n // 2) * log2_n * iters
    emit(
        f"ntt_2^{log2_n}",
        dt / iters,
        "s",
        {"butterflies_per_sec": round(butterflies / dt, 1)},
    )
    # correctness spot-check vs host path on a small transform
    small = vals[:256]
    om_s = NTT.omega_for_k(8)
    a_s = jax.numpy.asarray(FJ.ints_to_limbs([(v << 256) % F.FR_MOD for v in small]))
    dev = FJ.limbs_to_ints(np.asarray(NTT.ntt(a_s, om_s)))
    rinv = pow(1 << 256, -1, F.FR_MOD)
    dev = [v * rinv % F.FR_MOD for v in dev]
    assert dev == NTT.ntt_host(small, om_s), "device/host NTT mismatch"


def bench_criterion():
    """The reference criterion suite config: LEVELS=20 (2^20 entries),
    N_CURRENCIES=1, N_BYTES=8, k=13 (`zk_prover/benches/
    full_solvency_flow.rs:13-16`). Stages: tree build (device), keygen,
    create_proof, verify_proof (+ proof size)."""
    import numpy as np

    from circuits_halo2_tpu.merkle.device_tree import build_device_tree
    from circuits_halo2_tpu.merkle.mst import Entry
    from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
    from circuits_halo2_tpu.utils import pipeline
    from circuits_halo2_tpu.utils.srs import ParamsKZG

    # per-phase wall-clock of the k=13 prove into the campaign log (stderr)
    os.environ.setdefault("CIRCUITS_PROVE_TRACE", "1")
    levels, ncur, nbytes, k = 20, 1, 8, 13
    n = 1 << levels

    entry0 = Entry("dxGaEAii", [11888])
    rng = np.random.default_rng(0)
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    digests[0] = np.frombuffer(
        entry0.hashed_username.to_bytes(32, "big"), dtype=np.uint8
    )
    # balances < 2^40: the LEVEL-20 root sum (~n·2^39 ≈ 2^59) must stay
    # inside the N_BYTES=8 (2^64) range constraint — 48-bit balances made
    # the upper-level sums overflow the range check and the prover
    # (correctly) refused the witness with "quotient degree overflow"
    balances = rng.integers(0, 1 << 40, size=(n, ncur), dtype=np.uint64)
    balances[0, 0] = entry0.balances[0]

    use_pallas = os.environ.get("JAX_PLATFORMS", "") != "cpu"
    t0 = time.perf_counter()
    build_device_tree(digests, balances, use_pallas=use_pallas).root()
    cold = time.perf_counter() - t0  # includes at-size kernel compiles
    t0 = time.perf_counter()
    tree = build_device_tree(digests, balances, use_pallas=use_pallas)
    tree.root()
    emit("criterion_build_2^20", time.perf_counter() - t0, "s",
         {"cold_s": round(cold, 3)})

    # sorted-build criterion stage (`full_solvency_flow.rs:35-50`)
    from circuits_halo2_tpu.merkle.device_tree import build_device_tree_sorted

    usernames = rng.integers(0, 256, size=(n, 8), dtype=np.uint8).view("S8")[:, 0]
    t0 = time.perf_counter()
    stree, _ = build_device_tree_sorted(
        usernames, digests, balances, use_pallas=use_pallas
    )
    stree.root()
    emit("criterion_build_sorted_2^20", time.perf_counter() - t0, "s")

    here = os.path.dirname(os.path.abspath(__file__))
    srs_cache = os.path.join(here, ".bench_srs_k13.bin")
    if not os.path.exists(srs_cache):
        ParamsKZG.setup(k).write(srs_cache)

    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(k, srs_cache, levels, ncur, nbytes)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(k, srs_cache, levels, ncur, nbytes)
    emit("criterion_keygen_k13", time.perf_counter() - t0, "s",
         {"cold_s": round(cold, 3)})

    proof_w = tree.generate_proof(0, entry0)
    circuit = MstInclusionCircuit.init(levels, ncur, nbytes, proof_w)
    instances = circuit.instances()

    t0 = time.perf_counter()
    proof = pipeline.full_prover(art, circuit, instances)
    cold = time.perf_counter() - t0
    # warm pass: every jitted/Mosaic shape is compiled in-process now —
    # this is the steady-state per-proof cost at the criterion scale
    t0 = time.perf_counter()
    proof = pipeline.full_prover(art, circuit, instances)
    emit(
        "criterion_prove_k13",
        time.perf_counter() - t0,
        "s",
        {"proof_bytes": len(proof), "cold_s": round(cold, 3)},
    )

    t0 = time.perf_counter()
    ok = pipeline.full_verifier(art, proof, instances)
    emit("criterion_verify_k13", time.perf_counter() - t0, "s", {"ok": ok})
    assert ok, "criterion proof failed to verify"


def bench_northstar():
    """BASELINE.md north-star config: end-to-end proof for a 2^16-entry MST
    solvency circuit at k=17 (build → keygen → prove → verify). The SRS is
    the unsafe deterministic test setup cached on disk (the reference's
    in-bench `ParamsKZG::setup(k, OsRng)` equivalent,
    `zk_prover/src/circuits/utils.rs:67-73`)."""
    import numpy as np

    from circuits_halo2_tpu.merkle.device_tree import build_device_tree
    from circuits_halo2_tpu.merkle.mst import Entry
    from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
    from circuits_halo2_tpu.utils import pipeline
    from circuits_halo2_tpu.utils.srs import ParamsKZG

    os.environ.setdefault("CIRCUITS_PROVE_TRACE", "1")
    levels, ncur, nbytes, k = 16, 2, 8, 17
    n = 1 << levels

    entry0 = Entry("dxGaEAii", [11888, 41163])
    rng = np.random.default_rng(0)
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    digests[0] = np.frombuffer(
        entry0.hashed_username.to_bytes(32, "big"), dtype=np.uint8
    )
    balances = rng.integers(0, 1 << 48, size=(n, ncur), dtype=np.uint64)
    balances[0] = entry0.balances

    use_pallas = os.environ.get("JAX_PLATFORMS", "") != "cpu"
    t0 = time.perf_counter()
    build_device_tree(digests, balances, use_pallas=use_pallas).root()
    cold = time.perf_counter() - t0  # includes at-size kernel compiles
    t0 = time.perf_counter()
    tree = build_device_tree(digests, balances, use_pallas=use_pallas)
    tree.root()
    emit("northstar_build_2^16", time.perf_counter() - t0, "s",
         {"cold_s": round(cold, 3)})

    here = os.path.dirname(os.path.abspath(__file__))
    srs_cache = os.path.join(here, ".bench_srs_k17.bin")
    if not os.path.exists(srs_cache):
        t0 = time.perf_counter()
        ParamsKZG.setup(k).write(srs_cache)
        emit("northstar_srs_setup_k17", time.perf_counter() - t0, "s")

    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(k, srs_cache, levels, ncur, nbytes)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(k, srs_cache, levels, ncur, nbytes)
    emit("northstar_keygen_k17", time.perf_counter() - t0, "s",
         {"cold_s": round(cold, 3)})

    proof_w = tree.generate_proof(0, entry0)
    circuit = MstInclusionCircuit.init(levels, ncur, nbytes, proof_w)
    instances = circuit.instances()

    t0 = time.perf_counter()
    proof = pipeline.full_prover(art, circuit, instances)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    proof = pipeline.full_prover(art, circuit, instances)
    emit(
        "northstar_prove_k17",
        time.perf_counter() - t0,
        "s",
        {"proof_bytes": len(proof), "cold_s": round(cold, 3)},
    )

    t0 = time.perf_counter()
    ok = pipeline.full_verifier(art, proof, instances)
    emit("northstar_verify_k17", time.perf_counter() - t0, "s", {"ok": ok})
    assert ok, "north-star proof failed to verify"


def _setup():
    from circuits_halo2_tpu.utils import pipeline

    here = os.path.dirname(os.path.abspath(__file__))
    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(
        11, os.path.join(here, "tests/fixtures_ptau_hermez-raw-11"), 4, 2, 8
    )
    cold = time.perf_counter() - t0
    # warm split (VERDICT r3 weak #4): every jitted keygen shape is compiled
    # now, so the second run is the real keygen cost, not the compile tax
    t0 = time.perf_counter()
    art = pipeline.generate_setup_artifacts(
        11, os.path.join(here, "tests/fixtures_ptau_hermez-raw-11"), 4, 2, 8
    )
    emit("keygen_vk_pk_k11", time.perf_counter() - t0, "s",
         {"cold_s": round(cold, 3)})
    return art


def main():
    # campaign abort valve: lets a driver stop QUEUED stages cleanly
    # (killing a TPU client mid-flight wedges the axon tunnel for ~30-45
    # min — see PROGRESS.md; touching this sentinel instead makes the next
    # stage process exit before it ever claims the device)
    if os.path.exists(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_abort")
    ):
        # stderr, NOT stdout: the campaign script appends stdout to
        # BENCH_NUMBERS.jsonl and an abort notice is not a measurement
        print("bench_suite: .bench_abort present, exiting before device claim",
              file=sys.stderr)
        return
    stages = os.environ.get("BENCH_STAGES", "build,keygen,prove,verify").split(",")
    log2 = int(os.environ.get("BENCH_TREE_LOG2", 16))

    # one process on the tunnel at a time (utils/tpulock docstring)
    import atexit

    from circuits_halo2_tpu.utils.tpulock import TpuLock

    lock = TpuLock()
    lock.__enter__()
    atexit.register(lock.__exit__, None, None, None)
    jaxcache.enable()

    # each stage is exception-isolated: one failing stage must not take the
    # rest of the campaign down with it (round 3: a batch_throughput assert
    # killed the queued criterion/northstar stages — VERDICT r3 weak #1/#6)
    failures = []

    def run_stage(name, fn, *a):
        try:
            fn(*a)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            import traceback

            print(f"bench_suite: stage {name} FAILED: {e}", file=sys.stderr)
            traceback.print_exc()

    if "build" in stages:
        run_stage("build", bench_build, log2)

    if "msm" in stages:
        run_stage("msm", bench_msm, int(os.environ.get("BENCH_MSM_LOG2", 13)))

    if "ntt" in stages:
        run_stage("ntt", bench_ntt, int(os.environ.get("BENCH_NTT_LOG2", 15)))

    if "criterion" in stages:
        run_stage("criterion", bench_criterion)

    if "northstar" in stages:
        run_stage("northstar", bench_northstar)

    if not ({"keygen", "prove", "verify", "throughput", "batch_throughput"}
            & set(stages)):
        sys.exit(1 if failures else 0)

    # setup is exception-isolated too (ADVICE r4): a keygen failure aborts
    # only the stages that depend on its artifacts, not the exit accounting
    art = None

    def _do_setup():
        nonlocal art
        art = _setup()

    run_stage("setup", _do_setup)
    if art is None:
        print(
            "bench_suite: setup failed — skipping keygen/prove/verify/"
            "throughput stages",
            file=sys.stderr,
        )
        sys.exit(1)

    from circuits_halo2_tpu.merkle.mst import MerkleSumTree
    from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
    from circuits_halo2_tpu.utils import pipeline

    here = os.path.dirname(os.path.abspath(__file__))
    tree = MerkleSumTree.from_csv(
        os.path.join(here, "tests/fixtures_csv/entry_16.csv")
    )
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()

    proof_box = [None]

    def _prove_stage():
        t0 = time.perf_counter()
        proof = pipeline.full_prover(art, circuit, instances)
        cold = time.perf_counter() - t0
        # steady state: every jitted shape is compiled now; this is the
        # per-proof cost an operator pays across a user base
        t0 = time.perf_counter()
        proof = pipeline.full_prover(art, circuit, instances)
        emit(
            "prove_mst_inclusion_k11",
            time.perf_counter() - t0,
            "s",
            {"proof_bytes": len(proof), "cold_s": round(cold, 3)},
        )
        proof_box[0] = proof

    def _verify_stage():
        t0 = time.perf_counter()
        ok = pipeline.full_verifier(art, proof_box[0], instances)
        emit("verify_mst_inclusion_k11", time.perf_counter() - t0, "s", {"ok": ok})
        assert ok, "k11 proof failed to verify"

    def _throughput_stage():
        # sustained multi-user proving (the product workload: one proof per
        # user, embarrassingly parallel across users — SURVEY §7); steady
        # state after the cold compile above.
        users = int(os.environ.get("BENCH_USERS", 8))
        pipeline.full_prover(art, circuit, instances)  # ensure warm
        t0 = time.perf_counter()
        for u in range(users):
            c = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(u % 16))
            p = pipeline.full_prover(art, c, c.instances())
            assert pipeline.full_verifier(art, p, c.instances())
        dt = time.perf_counter() - t0
        emit(
            "prove_throughput_k11",
            round(users / (dt / 60.0), 2),
            "proofs/min",
            {"users": users, "total_s": round(dt, 2), "incl_verify": True},
        )

    if "prove" in stages:
        run_stage("prove", _prove_stage)

    if "verify" in stages and proof_box[0] is not None:
        run_stage("verify", _verify_stage)

    if "throughput" in stages:
        run_stage("throughput", _throughput_stage)

    if "batch_throughput" in stages:
        run_stage("batch_throughput", _bench_batch_throughput, art, tree)

    sys.exit(1 if failures else 0)


def _bench_batch_throughput(art, tree):
    """Sustained cross-user BATCHED proving (models/prover_batch): U users
    per device dispatch — the SURVEY §7 throughput lever, measured."""
    from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
    from circuits_halo2_tpu.models.prover import BlindingRng
    from circuits_halo2_tpu.models.prover_batch import prove_batch
    from circuits_halo2_tpu.utils import pipeline
    from circuits_halo2_tpu.utils.transcript import Blake2bTranscript

    users = int(os.environ.get("BENCH_USERS", 8))

    def batch():
        cs_ = [
            MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(u % 16))
            for u in range(users)
        ]
        # Blake2b = the native pipeline transcript (full_prover's), so the
        # proofs verify through pipeline.full_verifier. Round 3's campaign
        # crashed exactly here: prove_batch defaulted to the EVM Keccak
        # transcript while full_verifier replays Blake2b — a transcript
        # MISMATCH in the bench harness, not a device-numerics failure
        # (VERDICT r3 weak #1 diagnosed by scripts/diag_batch_tpu.py:
        # single proves with the same mismatch also fail verify on TPU,
        # while batch proofs stay byte-identical to single proofs).
        return prove_batch(
            art.params, art.pk, cs_, art.config,
            [c.instances() for c in cs_],
            rngs=[BlindingRng() for _ in cs_],
            transcript_cls=Blake2bTranscript,
            vk_digest=art.vk.transcript_repr,
        ), cs_

    batch()  # compile + warm the vmapped graphs
    t0 = time.perf_counter()
    proofs, cs_ = batch()
    dt = time.perf_counter() - t0
    # verify EVERY proof in the batch (outside the timed window)
    for p, c in zip(proofs, cs_):
        assert pipeline.full_verifier(art, p, c.instances()), (
            "batched proof failed to verify"
        )
    emit(
        "prove_batch_throughput_k11",
        round(users / (dt / 60.0), 2),
        "proofs/min",
        # measured round 5: batching LOSES to the sequential loop at k=11
        # (17.9 vs 26.4 proofs/min at U=8) — see models/prover_batch.py
        {"users": users, "total_s": round(dt, 2), "batched": True},
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: batched Poseidon hashing throughput on device.

This is the witness-side hot loop (Merkle sum tree build — reference
criterion bench "build merkle sum tree", `zk_prover/benches/
full_solvency_flow.rs:18-33`, which measures 2^20+1 Poseidon hashes on a
rayon CPU pool). Here the same t=2/8F/56P BN254 Poseidon runs as limb-
vectorized batches on the accelerator (ops/poseidon_pallas2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against a **measured** native-C++ CPU baseline:
the in-repo 4x64-bit CIOS Montgomery Poseidon (native/fieldcc.cpp,
poseidon_hash_batch) run multi-threaded on THIS host immediately before the
device timing — the same build_tree hot loop the reference runs with rayon,
measured on the hardware actually present. The JSON also reports the raw
host number (``baseline_host_hps``, with the thread count) and
``vs_ref_64core_est`` against a documented 2.0e6 hashes/s estimate for the
reference's rayon build on a large (64-core-class) CPU host — no number is
published in the reference tree (BASELINE.md: "published: {}"), so that
second figure is an assumption, kept for continuity with round 1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

REF_64CORE_EST_HPS = 2.0e6  # documented assumption (see module docstring)


def _measure_native_host(length: int) -> tuple[float, int]:
    """Measured hashes/s of the native C++ Poseidon on this host (all cores).

    Returns (hashes_per_sec, n_threads). 0.0 if the native library is
    unavailable (pure-container fallback — vs_baseline then uses the
    documented reference estimate instead)."""
    try:
        import numpy as np

        from circuits_halo2_tpu import native

        lib = native.get()
        if lib is None:
            return 0.0, 0
        native._poseidon_setup(lib)
        n = int(os.environ.get("BENCH_HOST_N", 100_000))
        rng = np.random.default_rng(1)
        # random 62-bit words: representative field elements for the sponge
        flat = rng.integers(0, 1 << 62, size=n * length, dtype=np.uint64)
        inp = np.zeros((n * length, 32), dtype=np.uint8)
        inp[:, :8] = flat.view(np.uint8).reshape(-1, 8)
        out = np.empty((n, 32), dtype=np.uint8)
        # warm once (thread pool spawn, page faults)
        lib.poseidon_hash_batch(native._u8ptr(inp), n // 10, length, native._u8ptr(out))
        t0 = time.perf_counter()
        lib.poseidon_hash_batch(native._u8ptr(inp), n, length, native._u8ptr(out))
        dt = time.perf_counter() - t0
        nthreads = int(os.environ.get("CIRCUITS_NATIVE_THREADS", os.cpu_count() or 1))
        return n / dt, nthreads
    except Exception:
        return 0.0, 0


def _probe_tunnel() -> float:
    """Round-trip a tiny dispatch; returns latency in seconds. A healthy
    tunnel answers in well under a second (post-init); a wedged or
    contended one takes tens of seconds — in that case wait and retry so a
    degraded environment is never recorded as the round's number
    (VERDICT r3 weak #2: a crashed campaign left the tunnel contended and
    the driver bench recorded a 7x regression)."""
    import numpy as np
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(np.asarray(jnp.arange(1024).sum()))
    return time.perf_counter() - t0


def main() -> None:
    # take the tunnel lock BEFORE anything that can initialize the jax
    # backend (importing the ops modules touches jnp constants): a second
    # connected axon client starves the one doing work
    import atexit

    from circuits_halo2_tpu.utils.tpulock import TpuLock

    lock = TpuLock()
    lock.__enter__()
    atexit.register(lock.__exit__, None, None, None)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from circuits_halo2_tpu.ops import poseidon
    from circuits_halo2_tpu.ops import poseidon_fast as PF

    # Operating point re-characterized after a remote Mosaic compiler
    # update changed the kernel's batch-size response: the old default
    # (batch=16384) dropped from ~930k to ~370k h/s while ONE tile per
    # scan step (batch=1024) now runs 1.47M h/s — the measured sweep is
    # 1024: 1475k, 2048: 1393k, 4096: 1335k, 8192: 1160k, 16384: 367k,
    # 65536: 435k. Total hashes per trial stays 262144 (batch·iters).
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    iters = int(os.environ.get("BENCH_ITERS", 262144 // 1024))
    length = 3  # leaf preimage for 2 currencies

    rng = np.random.default_rng(0)
    arr = rng.integers(
        0, 1 << 14, size=(length, PF.NLIMBS, batch), dtype=np.uint32
    )
    arr[:, PF.LOW :, :] = 0  # values < 2^255/2

    impl = os.environ.get("BENCH_IMPL", "pallas2")
    if impl == "pallas2":
        from circuits_halo2_tpu.ops import poseidon_pallas2 as PPL2

        assert batch % PPL2.TILE == 0, (
            f"BENCH_BATCH={batch} must be a multiple of the pallas tile "
            f"({PPL2.TILE}); a partial tile produces wrong digests"
        )
        hash_fn = PPL2.hash_batch_pallas2
    else:
        hash_fn = PF.hash_batch15
    x = jnp.asarray(arr)

    # timing loop inside one jit dispatch (lax.scan with data dependency):
    # measures device throughput, not per-dispatch tunnel latency. This is
    # the ONLY graph the bench compiles — the correctness spot-check below
    # replays the same chained sponge on the host, so no second (unchained)
    # compile is paid just to compare one hash.
    def chained(x0):
        def body(state, _):
            h = hash_fn(state)
            return jnp.stack([h] * length), h

        final_state, _ = jax.lax.scan(body, x0, None, length=iters)
        return final_state

    probe = _probe_tunnel()
    deadline = time.time() + float(os.environ.get("BENCH_PROBE_WAIT_S", 600))
    while probe > 2.0 and time.time() < deadline:
        print(f"bench: tunnel probe {probe:.1f}s — degraded, retrying in 60s",
              file=sys.stderr, flush=True)
        time.sleep(60)
        probe = _probe_tunnel()

    chained_fn = jax.jit(chained)
    final = np.asarray(chained_fn(x))  # compile + warm (full materialization)

    # correctness spot-check against the host path: iterate the same chain
    # (h <- H(h, h, h)) on column 0 and compare the device's final state.
    from circuits_halo2_tpu.ops import field as F

    h = poseidon.hash_n(
        [
            PF.limbs15_to_ints(arr[i, :, :1])[0] * PF.R15_INV % F.FR_MOD
            for i in range(length)
        ]
    )
    for _ in range(iters - 1):
        h = poseidon.hash_n([h] * length)
    dev0 = PF.limbs15_to_ints(final[0][:, :1])[0] * PF.R15_INV % F.FR_MOD
    assert dev0 == h, "device/host chained hash mismatch"
    print("correctness spot-check passed", file=sys.stderr)

    # best-of-3: one slow trial (GC pause, tunnel hiccup, competing host
    # load) must not become the round's recorded number
    trials = []
    for _ in range(int(os.environ.get("BENCH_TRIALS", 3))):
        t0 = time.perf_counter()
        np.asarray(chained_fn(x))
        trials.append(time.perf_counter() - t0)
    dt = min(trials)
    hashes_per_sec = batch * iters / dt

    host_hps, host_threads = _measure_native_host(length)
    baseline = host_hps if host_hps > 0 else REF_64CORE_EST_HPS
    print(
        json.dumps(
            {
                "metric": "poseidon_bn254_hashes_per_sec",
                "value": round(hashes_per_sec, 1),
                "unit": "hashes/s",
                "vs_baseline": round(hashes_per_sec / baseline, 3),
                "probe_s": round(probe, 3),
                "trials_s": [round(t, 3) for t in trials],
                "baseline_host_hps": round(host_hps, 1),
                "baseline_host_threads": host_threads,
                "vs_ref_64core_est": round(hashes_per_sec / REF_64CORE_EST_HPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: batched Poseidon hashing throughput on device.

This is the witness-side hot loop (Merkle sum tree build — reference
criterion bench "build merkle sum tree", `zk_prover/benches/
full_solvency_flow.rs:18-33`, which measures 2^20+1 Poseidon hashes on a
rayon CPU pool). Here the same t=2/8F/56P BN254 Poseidon runs as limb-
vectorized batches on the accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against an estimated 2.0e6 hashes/s for the
reference's rayon build on a large CPU host (no number is published
in-tree — BASELINE.md: "published: {}"; this anchor is a documented
assumption, not a measured reference value).
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

BASELINE_HASHES_PER_SEC = 2.0e6  # documented assumption (see module docstring)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from circuits_halo2_tpu.ops import poseidon
    from circuits_halo2_tpu.ops import poseidon_fast as PF

    batch = int(os.environ.get("BENCH_BATCH", 16384))
    iters = int(os.environ.get("BENCH_ITERS", 16))
    length = 3  # leaf preimage for 2 currencies

    rng = np.random.default_rng(0)
    arr = rng.integers(
        0, 1 << 14, size=(length, PF.NLIMBS, batch), dtype=np.uint32
    )
    arr[:, PF.LOW :, :] = 0  # values < 2^255/2

    impl = os.environ.get("BENCH_IMPL", "pallas2")
    if impl == "pallas2":
        from circuits_halo2_tpu.ops import poseidon_pallas2 as PPL2

        fn = jax.jit(PPL2.hash_batch_pallas2)
    elif impl == "pallas":
        from circuits_halo2_tpu.ops import poseidon_pallas as PPL

        fn = jax.jit(PPL.hash_batch_pallas)
    else:
        fn = jax.jit(PF.hash_batch15)
    x = jnp.asarray(arr)
    np.asarray(fn(x))  # compile + warm (full materialization)

    # correctness spot-check against the host path
    from circuits_halo2_tpu.ops import field as F

    dev0 = PF.limbs15_to_ints(np.asarray(fn(x))[:, :1])[0] * PF.R15_INV % F.FR_MOD
    msg = [
        PF.limbs15_to_ints(arr[i, :, :1])[0] * PF.R15_INV % F.FR_MOD
        for i in range(length)
    ]
    assert dev0 == poseidon.hash_n(msg), "device/host hash mismatch"
    print("correctness spot-check passed", file=sys.stderr)

    # timing loop inside one jit dispatch (lax.scan with data dependency):
    # measures device throughput, not per-dispatch tunnel latency.
    if impl == "pallas2":
        from circuits_halo2_tpu.ops import poseidon_pallas2 as PPL2

        hash_fn = PPL2.hash_batch_pallas2
    elif impl == "pallas":
        from circuits_halo2_tpu.ops import poseidon_pallas as PPL

        hash_fn = PPL.hash_batch_pallas
    else:
        hash_fn = PF.hash_batch15

    def chained(x0):
        def body(state, _):
            h = hash_fn(state)
            return jnp.stack([h] * length), h

        final_state, _ = jax.lax.scan(body, x0, None, length=iters)
        return final_state

    chained_fn = jax.jit(chained)
    np.asarray(chained_fn(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chained_fn(x))
    dt = time.perf_counter() - t0

    hashes_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "poseidon_bn254_hashes_per_sec",
                "value": round(hashes_per_sec, 1),
                "unit": "hashes/s",
                "vs_baseline": round(hashes_per_sec / BASELINE_HASHES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

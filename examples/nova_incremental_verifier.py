"""Incremental inclusion across rounds — the reference's Nova IVC example,
TPU-native (`zk_prover/examples/nova_incremental_verifier.rs:23-226`).

The CEX proves a user's inclusion in the liabilities tree for rounds 1..3 in
one verifiable chain. Two layers run here:

1. **Circom-parity witness chain** (`merkle/circom_mst.py`): the exact state
   trajectory the reference computes with circom's Poseidon —
   user_state_i = H(user_state_{i-1}, leaf_hash_i),
   liab_state_i = H(liab_state_{i-1}, root_hash_i).
2. **TPU step-proof chain** (`models/incremental.py`): the same statement in
   the framework's PLONKish IR, one KZG+SHPLONK SNARK per round, chained by
   public-input equality (Nova folding compresses these into one proof; here
   each step is independently verifiable — see module docstring).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from circuits_halo2_tpu.merkle import circom_mst as CM
from circuits_halo2_tpu.models import incremental as INC
from circuits_halo2_tpu.utils import pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
STATES = [
    os.path.join(HERE, "..", "tests", "fixtures_csv", "states", f"entry_16_{i}.csv")
    for i in (1, 2, 3)
]
PTAU = os.path.join(HERE, "..", "tests", "fixtures_ptau_hermez-raw-11")


def main() -> None:
    user_index = 0

    # 1. circom-parity witness chain
    proofs, user_states, liab_states = CM.state_chain(STATES, user_index)
    for p in proofs:
        assert CM.verify_merkle_proof(p)
    print(f"user_state_cur at state 3 (circom chain):        {hex(user_states[-1])}")
    print(f"liabilities_state_cur at state 3 (circom chain): {hex(liab_states[-1])}")

    # 2. TPU step-proof chain
    t0 = time.time()
    art = pipeline.generate_incremental_artifacts(11, PTAU, 4, 2, 8)
    print(f"step-circuit keygen: {time.time() - t0:.1f}s")

    t0 = time.time()
    chain = INC.prove_chain(art, STATES, user_index)
    print(f"3 chained step proofs: {time.time() - t0:.1f}s "
          f"({len(chain.steps[0].proof)} bytes each)")

    t0 = time.time()
    assert INC.verify_chain(art, chain)
    print(f"chain verification: {time.time() - t0:.1f}s")
    print(f"user_state_cur at state 3 (proof chain):        {hex(chain.user_states[-1])}")
    print(f"liabilities_state_cur at state 3 (proof chain): {hex(chain.liab_states[-1])}")


if __name__ == "__main__":
    main()

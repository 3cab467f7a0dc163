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
   public-input equality (each step independently verifiable).
3. **Nova NIFS accumulation** (`models/nova_fold.py` over
   `merkle/circom_r1cs.py`): the reference's actual mechanism — every step
   R1CS instance folds into ONE running committed relaxed instance; the
   verifier replays N O(1) instance folds and runs a single relaxed-SAT
   check (`nova_incremental_verifier.rs:170-198`).
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

    # 3. Nova NIFS: fold the three step R1CS instances into one accumulator
    from circuits_halo2_tpu.merkle import circom_r1cs as CR
    from circuits_halo2_tpu.models import nova_fold as NF

    t0 = time.time()
    wits, r1cs, si = [], None, (0, 0)
    for i, p in enumerate(proofs):
        r1cs_i, w = CR.build_incremental_mst_inclusion(p, si)
        r1cs = r1cs or r1cs_i
        wits.append(w)
        si = (w[1], w[2])  # step_out becomes next step_in
    bases = NF.pedersen_bases(max(r1cs.n_wires, len(r1cs.constraints)))
    acc_i, acc_w, steps = NF.fold_chain(r1cs, wits, bases)
    # pinned endpoints: chain starts at the zero state and must end at the
    # circom-chain's final (user_state, liabilities_state)
    assert NF.verify_chain(r1cs, steps, acc_i, acc_w, bases,
                           z0=[0, 0], zn=[user_states[-1], liab_states[-1]])
    print(f"NIFS: folded {len(wits)} steps "
          f"({len(r1cs.constraints)} constraints each) into one relaxed "
          f"instance; verified in {time.time() - t0:.1f}s total")

    # 4. CompressedSNARK (Spartan + IPA-PC, `models/spartan.py`): replace
    # the witness reveal with an O(log|C|) proof — the reference's
    # CompressedSNARK stage (`nova_incremental_verifier.rs:199-226`)
    from circuits_halo2_tpu.models import spartan as SP

    t0 = time.time()
    cproof = SP.compress(r1cs, acc_i, acc_w, bases)
    t_prove = time.time() - t0
    t0 = time.time()
    assert SP.verify_chain_compressed(
        r1cs, steps, acc_i, cproof, bases, n_w=len(acc_w.w),
        z0=[0, 0], zn=[user_states[-1], liab_states[-1]])
    t_verify = time.time() - t0
    wit_bytes = 32 * (len(acc_w.w) + len(acc_w.e))
    print(f"CompressedSNARK: {cproof.size_bytes()} bytes "
          f"(vs {wit_bytes}-byte witness reveal), "
          f"prove {t_prove:.1f}s / verify {t_verify:.1f}s")


if __name__ == "__main__":
    main()

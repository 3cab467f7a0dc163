"""Canonical operator round flow — the product entry point.

Parity target: `backend/examples/summa_solvency_flow.rs:22-138`:
1) submit address-ownership proofs, 2) dispatch the liabilities commitment,
3) export a user's inclusion-proof calldata JSON, 4) user-side verification
(leaf-hash re-derivation + on-chain root match + verifyInclusionProof).

The chain is the in-process Summa simulation (no EVM node in this
environment); every other stage is the real pipeline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from circuits_halo2_tpu.backend.address_ownership import AddressOwnership
from circuits_halo2_tpu.backend.apis import leaf_hash_from_inputs
from circuits_halo2_tpu.backend.round import Round
from circuits_halo2_tpu.backend.signer import SummaSigner
from circuits_halo2_tpu.contracts.summa_sim import SummaContractSim
from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.models.verifier import verify
from circuits_halo2_tpu.utils.transcript import KeccakTranscript

HERE = os.path.dirname(os.path.abspath(__file__))
CSV = os.path.join(HERE, "../tests/fixtures_csv")
PTAU = os.path.join(HERE, "../tests/fixtures_ptau_hermez-raw-11")
USER_INDEX = 0
LEVELS, N_CURRENCIES, N_BYTES = 4, 2, 8


def main():
    # 0. deploy: verifier closure backed by the framework verifier
    artifacts_box = {}

    def onchain_verifier(proof_bytes, instances):
        art = artifacts_box["artifacts"]
        return verify(
            art.params,
            art.vk,
            [instances],
            proof_bytes,
            transcript_cls=KeccakTranscript,
        )

    summa = SummaContractSim(onchain_verifier, LEVELS, N_CURRENCIES, N_BYTES)
    signer = SummaSigner("0x" + "11" * 32, summa, sender=summa.owner)

    # 1. ownership proofs
    ownership = AddressOwnership(signer, os.path.join(CSV, "signatures.csv"))
    ownership.dispatch_proof_of_address_ownership()
    print(f"1. Ownership proofs registered ({len(summa.address_ownership_proofs)})")

    # 2. build the snapshot and commit liabilities
    timestamp = 1
    mst = MerkleSumTree.from_csv(os.path.join(CSV, "entry_16.csv"))
    t0 = time.time()
    round_ = Round(signer, mst, PTAU, timestamp, LEVELS, N_CURRENCIES, N_BYTES)
    artifacts_box["artifacts"] = round_.snapshot.trusted_setup
    round_.dispatch_commitment()
    print(f"2. Commitment submitted (setup {time.time()-t0:.0f}s)")

    # 3. per-user inclusion proof
    t0 = time.time()
    proof = round_.get_proof_of_inclusion(USER_INDEX)
    out_path = os.path.join(HERE, "inclusion_proof_solidity_calldata.json")
    with open(out_path, "w") as f:
        json.dump(
            {"proof": proof.proof_calldata, "public_inputs": proof.public_inputs},
            f,
        )
    print(f"3. Inclusion proof exported ({time.time()-t0:.0f}s) -> {out_path}")

    # 4. user-side verification
    entry = mst.entries[USER_INDEX]
    expected_leaf = leaf_hash_from_inputs(
        entry.username, [str(b) for b in entry.balances]
    )
    assert expected_leaf == int(proof.public_inputs[0], 16), "leaf hash mismatch"
    onchain = summa.commitments[timestamp]
    assert onchain.mst_root == int(proof.public_inputs[1], 16), "root mismatch"
    ok = summa.verify_inclusion_proof(
        bytes.fromhex(proof.proof_calldata[2:]),
        [int(v, 16) for v in proof.public_inputs],
        timestamp,
    )
    assert ok, "on-chain verification failed"
    print("4. User-side verification passed — round complete")


if __name__ == "__main__":
    main()

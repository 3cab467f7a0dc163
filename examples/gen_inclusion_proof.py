"""Full E2E: build MST, prove user 0, run the verifier contract in the
in-process EVM interpreter, export calldata JSON.

Parity target: `zk_prover/examples/gen_inclusion_proof.rs:22-93` (which
uses an embedded revm EVM; here the Yul interpreter executes the
reference-generated verifier contract when available, else the
self-generated one).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from circuits_halo2_tpu.contracts.yul_vm import run_verifier_gas
from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
from circuits_halo2_tpu.utils import pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
LEVELS, N_CURRENCIES, N_BYTES = 4, 2, 8
USER_INDEX = 0

REFERENCE_VERIFIER = "/root/reference/contracts/src/InclusionVerifier.sol"


def main():
    artifacts = pipeline.generate_setup_artifacts(
        11,
        os.path.join(HERE, "../tests/fixtures_ptau_hermez-raw-11"),
        LEVELS,
        N_CURRENCIES,
        N_BYTES,
    )
    tree = MerkleSumTree.from_csv(
        os.path.join(HERE, "../tests/fixtures_csv/entry_16.csv")
    )
    circuit = MstInclusionCircuit.init(
        LEVELS, N_CURRENCIES, N_BYTES, tree.generate_proof(USER_INDEX)
    )

    # use the reference VK digest when verifying against the reference
    # contract (our native pinned digest differs; see models/pinning.py)
    vk_digest = None
    if os.path.exists(REFERENCE_VERIFIER):
        fix = json.load(
            open(os.path.join(HERE, "../tests/fixtures_vk_inclusion.json"))
        )
        vk_digest = int(fix["vk_digest"], 16)

    calldata = pipeline.gen_proof_solidity_calldata(
        artifacts, circuit, vk_digest=vk_digest
    )
    out = os.path.join(HERE, "inclusion_proof_solidity_calldata.json")
    with open(out, "w") as f:
        json.dump(
            {"proof": calldata.proof, "public_inputs": calldata.public_inputs}, f
        )
    print(f"wrote {out}")

    if os.path.exists(REFERENCE_VERIFIER):
        sol = open(REFERENCE_VERIFIER).read()
        ok, gas = run_verifier_gas(
            sol,
            bytes.fromhex(calldata.proof[2:]),
            [int(v, 16) for v in calldata.public_inputs],
        )
        # reference prints "Gas cost of verifying ...: {gas}"
        # (zk_prover/examples/gen_inclusion_proof.rs:87-92)
        print(f"reference InclusionVerifier.sol accepts the proof: {ok}")
        print(f"Gas cost of verifying the inclusion proof: {gas} (VM estimate)")
        assert ok


if __name__ == "__main__":
    main()

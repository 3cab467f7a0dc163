"""Generate the Solidity inclusion-verifier contract from the VK.

Parity target: `zk_prover/examples/gen_inclusion_verifier.rs:16-94` —
overflow guard, keygen from the ptau, render the verifier, report size.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from circuits_halo2_tpu.contracts.sol_generator import SolidityGenerator
from circuits_halo2_tpu.utils import pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
LEVELS, N_CURRENCIES, N_BYTES = 4, 2, 8


def main():
    if pipeline.is_there_risk_of_overflow(N_BYTES, LEVELS):
        raise SystemExit(
            "Risk of overflow in the Merkle root: reduce N_BYTES or LEVELS"
        )
    artifacts = pipeline.generate_setup_artifacts(
        11,
        os.path.join(HERE, "../tests/fixtures_ptau_hermez-raw-11"),
        LEVELS,
        N_CURRENCIES,
        N_BYTES,
    )
    generator = SolidityGenerator(
        artifacts.params, artifacts.vk, 2 + N_CURRENCIES
    )
    source = generator.render()
    out = os.path.join(HERE, "InclusionVerifier.sol")
    with open(out, "w") as f:
        f.write(source)
    print(f"Saved {out} ({len(source)} bytes of source)")
    # reference prints the compiled creation-code size
    # (gen_inclusion_verifier.rs:39-40); no solc in this environment, so
    # report the deterministic instruction-count estimate instead.
    from circuits_halo2_tpu.contracts.yul_vm import estimate_code_size

    print(
        "Estimated verifier runtime code size: "
        f"{estimate_code_size(source)} bytes (instruction-count model)"
    )


if __name__ == "__main__":
    main()

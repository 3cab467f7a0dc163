"""Regeneration pipeline — verifier contract + commitment calldata.

Parity target: `backend/scripts/update_verifier_contract.sh:1-33`
(gen verifier → gen commitment → deploy → rebuild bindings). Here:
1. regenerate InclusionVerifier.sol from the current VK,
2. regenerate the commitment calldata JSON,
3. smoke-verify a fresh proof against the generated artifacts.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(script: str):
    print(f"==> {script}")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)], check=True
    )


def main():
    run("gen_inclusion_verifier.py")
    run("gen_commitment.py")
    run("gen_inclusion_proof.py")
    print("regeneration pipeline complete")


if __name__ == "__main__":
    main()

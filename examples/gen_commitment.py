"""Generate the on-chain commitment calldata for a CSV snapshot.

Parity target: `zk_prover/examples/gen_commitment.rs:14-41` — build the MST
and export ``(root_hash, root_balances)`` as Solidity calldata JSON.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.utils.pipeline import field_element_to_solidity_calldata

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    tree = MerkleSumTree.from_csv(
        os.path.join(HERE, "../tests/fixtures_csv/entry_16.csv")
    )
    data = {
        "root_hash": field_element_to_solidity_calldata(tree.root.hash),
        "root_balances": [
            field_element_to_solidity_calldata(b) for b in tree.root.balances
        ],
    }
    out = os.path.join(HERE, "commitment_solidity_calldata.json")
    with open(out, "w") as f:
        json.dump(data, f)
    print(f"wrote {out}: {data}")


if __name__ == "__main__":
    main()

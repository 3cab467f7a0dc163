"""Extract the hard-coded VK constants from the reference's generated
verifier contract into a JSON test fixture (golden values for keygen parity).

Usage: python scripts/extract_vk_constants.py
"""

import json
import re
from pathlib import Path

SRC = Path("/root/reference/contracts/src/InclusionVerifier.sol")
OUT = Path(__file__).resolve().parent.parent / "tests/fixtures_vk_inclusion.json"


def main():
    text = SRC.read_text()
    consts = {}
    fixed = {}
    perm = {}
    for m in re.finditer(r"mstore\(0x[0-9a-f]+, (0x[0-9a-f]+)\) // (\S+)", text):
        value, name = int(m.group(1), 16), m.group(2)
        fm = re.match(r"fixed_comms\[(\d+)\]\.(x|y)", name)
        pm = re.match(r"permutation_comms\[(\d+)\]\.(x|y)", name)
        if fm:
            fixed.setdefault(int(fm.group(1)), {})[fm.group(2)] = value
        elif pm:
            perm.setdefault(int(pm.group(1)), {})[pm.group(2)] = value
        else:
            consts[name] = value
    delta = int(
        re.search(r"let delta := (\d+)", text).group(1)
    )
    data = {
        "vk_digest": hex(consts["vk_digest"]),
        "k": consts["k"],
        "n_inv": hex(consts["n_inv"]),
        "omega": hex(consts["omega"]),
        "omega_inv": hex(consts["omega_inv"]),
        "omega_inv_to_l": hex(consts["omega_inv_to_l"]),
        "num_instances": consts["num_instances"],
        "delta": hex(delta),
        "neg_s_g2": [
            hex(consts["neg_s_g2_x_1"]),
            hex(consts["neg_s_g2_x_2"]),
            hex(consts["neg_s_g2_y_1"]),
            hex(consts["neg_s_g2_y_2"]),
        ],
        "fixed_comms": [
            [hex(fixed[i]["x"]), hex(fixed[i]["y"])] for i in sorted(fixed)
        ],
        "permutation_comms": [
            [hex(perm[i]["x"]), hex(perm[i]["y"])] for i in sorted(perm)
        ],
    }
    OUT.write_text(json.dumps(data, indent=1))
    print(
        f"wrote {OUT}: {len(fixed)} fixed comms, {len(perm)} permutation comms"
    )


if __name__ == "__main__":
    main()

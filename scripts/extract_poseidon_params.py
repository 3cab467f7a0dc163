"""Extract the Poseidon cryptographic parameters (round constants, MDS) from
the reference's generated parameter file into a JSON data file.

These are protocol constants (output of the Grain LFSR sampling documented in
the reference header: ``sage generate_parameters_grain.sage 1 0 254 2 8 56
0x30644e...``), not code. ``circuits_halo2_tpu.ops.grain`` independently
re-generates the round constants and is cross-checked against this JSON in
tests.

Usage: python scripts/extract_poseidon_params.py
"""

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/zk_prover/src/chips/poseidon/poseidon_params.rs")
OUT = Path(__file__).resolve().parent.parent / (
    "circuits_halo2_tpu/ops/poseidon_constants.json"
)


def parse_from_raw_values(text: str) -> list[int]:
    """Every Fp::from_raw([u64;4]) → integer value (LE limb order)."""
    values = []
    for m in re.finditer(r"from_raw\(\[(.*?)\]\)", text, re.S):
        limbs = [
            int(tok.replace("_", ""), 16)
            for tok in re.findall(r"0x[0-9a-fA-F_]+", m.group(1))
        ]
        assert len(limbs) == 4, limbs
        v = limbs[0] | (limbs[1] << 64) | (limbs[2] << 128) | (limbs[3] << 192)
        values.append(v)
    return values


def main() -> None:
    text = REF.read_text()
    # Split the file into the three constant blocks by their declarations.
    rc_part = text.split("ROUND_CONSTANTS")[1].split("const MDS")[0]
    mds_part = text.split("const MDS:")[1].split("const MDS_INV")[0]
    mds_inv_part = text.split("const MDS_INV:")[1]

    rc = parse_from_raw_values(rc_part)
    mds = parse_from_raw_values(mds_part)
    mds_inv = parse_from_raw_values(mds_inv_part)
    assert len(rc) == 128 and len(mds) == 4 and len(mds_inv) == 4

    data = {
        "t": 2,
        "rate": 1,
        "full_rounds": 8,
        "partial_rounds": 56,
        "alpha": 5,
        "field_modulus": hex(
            0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
        ),
        "round_constants": [
            [hex(rc[2 * i]), hex(rc[2 * i + 1])] for i in range(64)
        ],
        "mds": [[hex(mds[0]), hex(mds[1])], [hex(mds[2]), hex(mds[3])]],
        "mds_inv": [
            [hex(mds_inv[0]), hex(mds_inv[1])],
            [hex(mds_inv[2]), hex(mds_inv[3])],
        ],
    }
    OUT.write_text(json.dumps(data, indent=1))
    print(f"wrote {OUT} ({len(rc)} round constants)")


if __name__ == "__main__":
    sys.exit(main())

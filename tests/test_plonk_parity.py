"""PLONKish parity tests against the reference's generated verifier contract
and proof fixtures — the strongest cross-implementation anchors available:

1. compiled constraint-system structure == reference keygen output;
2. all VK commitments (11 fixed + 6 permutation) match bit-for-bit;
3. the reference's proof JSON fixture verifies; corrupted proofs don't.
"""

import json
from pathlib import Path

import pytest

from circuits_halo2_tpu.models.keygen import DELTA, keygen
from circuits_halo2_tpu.models.mst_inclusion import compile_circuit
from circuits_halo2_tpu.models.verifier import rotation_sets, verify
from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops.ntt import omega_for_k
from circuits_halo2_tpu.utils.srs import ParamsKZG

HERE = Path(__file__).parent
VK_FIX = json.loads((HERE / "fixtures_vk_inclusion.json").read_text())
PROOF_FIX = json.loads((HERE / "fixtures_proof_calldata.json").read_text())


@pytest.fixture(scope="module")
def compiled():
    return compile_circuit(4, 2, 8, 11)


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.read(str(HERE / "fixtures_ptau_hermez-raw-11"))


@pytest.fixture(scope="module")
def keys(params, compiled):
    _, cs, _, asn = compiled
    return keygen(params, cs, asn)


def test_domain_constants():
    assert DELTA == int(VK_FIX["delta"], 16)
    assert omega_for_k(11) == int(VK_FIX["omega"], 16)
    assert F.fr_inv(2048) == int(VK_FIX["n_inv"], 16)


def test_compiled_structure(compiled):
    _, cs, _, _ = compiled
    assert cs.num_advice == 3 and cs.num_fixed == 11 and cs.num_instance == 1
    assert cs.advice_queries == [
        (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (1, -1), (0, -1)
    ]
    assert cs.fixed_queries == [
        (2, 0), (3, 0), (0, 0), (1, 0), (4, 0),
        (5, 0), (6, 0), (7, 0), (8, 0), (9, 0), (10, 0),
    ]
    assert [(c.kind, c.index) for c in cs.permutation_columns] == [
        ("fixed", 2), ("advice", 0), ("advice", 1),
        ("fixed", 3), ("advice", 2), ("instance", 0),
    ]
    assert cs.degree() == 6
    assert cs.blinding_factors() == 5
    assert F.fr_pow(
        F.fr_inv(omega_for_k(11)), cs.blinding_factors() + 1
    ) == int(VK_FIX["omega_inv_to_l"], 16)


def test_rotation_sets(compiled):
    _, cs, _, _ = compiled
    sets = rotation_sets(cs)
    assert [rots for rots, _ in sets] == [
        (-1, 0, 1), (0,), (-6, 0, 1), (0, 1), (-1, 0)
    ]
    assert sets[0][1] == [("advice", 0), ("advice", 1)]
    assert sets[1][1][:2] == [("advice", 2), ("lookup_s", 0)]
    assert sets[1][1][-2:] == [("quotient",), ("random",)]
    assert sets[3][1] == [("perm_z", 1), ("lookup_z", 0)]


def test_vk_commitments_match_reference(keys):
    vk, _ = keys
    want_fixed = [(int(x, 16), int(y, 16)) for x, y in VK_FIX["fixed_comms"]]
    want_perm = [
        (int(x, 16), int(y, 16)) for x, y in VK_FIX["permutation_comms"]
    ]
    assert vk.fixed_commitments == want_fixed
    assert vk.permutation_commitments == want_perm


def test_vk_transcript_repr_matches_reference(keys):
    """Blake2b pinned-VK digest parity: our rendering of the Rust fork's
    `format!("{:?}", vk.pinned())` hashes to the exact vk_digest hard-coded
    in the reference-generated InclusionVerifier.sol. This pins the entire
    constraint-system structure (gates, queries, permutation, lookups,
    constants, domain) character-for-character."""
    vk, _ = keys
    assert vk.transcript_repr == int(VK_FIX["vk_digest"], 16)


def test_reference_proof_fixture_verifies(params, keys):
    vk, _ = keys
    proof = bytes.fromhex(PROOF_FIX["proof"][2:])
    instances = [[int(x, 16) for x in PROOF_FIX["public_inputs"]]]
    assert verify(
        params, vk, instances, proof, vk_digest=int(VK_FIX["vk_digest"], 16)
    )


def test_corrupted_proof_rejected(params, keys):
    vk, _ = keys
    proof = bytearray(bytes.fromhex(PROOF_FIX["proof"][2:]))
    instances = [[int(x, 16) for x in PROOF_FIX["public_inputs"]]]
    proof[200] ^= 1
    try:
        ok = verify(
            params, vk, instances, bytes(proof),
            vk_digest=int(VK_FIX["vk_digest"], 16),
        )
    except ValueError:
        ok = False
    assert not ok


def test_wrong_instances_rejected(params, keys):
    vk, _ = keys
    proof = bytes.fromhex(PROOF_FIX["proof"][2:])
    instances = [[int(x, 16) for x in PROOF_FIX["public_inputs"]]]
    instances[0][2] = (instances[0][2] + 1) % F.FR_MOD
    assert not verify(
        params, vk, instances, proof, vk_digest=int(VK_FIX["vk_digest"], 16)
    )

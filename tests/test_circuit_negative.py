"""Circuit negative tests — MockProver failure localization.

Mirrors the reference's `zk_prover/src/circuits/tests.rs` strategy (SURVEY
§4): positive MockProver runs for all users, then tamper with specific
witness/instance values and assert the exact class of constraint failures.
"""

from pathlib import Path

import pytest

from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.models.mock_prover import (
    CopyFailure,
    GateFailure,
    LookupFailure,
    MockProver,
)
from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit
from circuits_halo2_tpu.ops.field import FR_MOD

CSV = Path(__file__).parent / "fixtures_csv"
K = 11


@pytest.fixture(scope="module")
def tree():
    return MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))


def _prover(circuit, instances=None):
    return MockProver(K, circuit, instances or circuit.instances())


def test_valid_witness_all_users(tree):
    # the reference checks all 16 users (`tests.rs:26-43`); a spread of
    # indices keeps runtime reasonable while covering both subtree halves
    for index in (0, 5, 10, 15):
        circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(index))
        assert _prover(circuit).verify() == []


def test_invalid_root_hash_instance(tree):
    """`tests.rs:91-123` — tampered root hash public input → copy failure
    against the instance column."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    instances[0][1] = (instances[0][1] + 1) % FR_MOD
    failures = _prover(circuit, instances).verify()
    # exactly ONE failure: the exposed root-hash cell (advice col 0, the
    # final middle-hash output row) no longer equals instance row 1 — the
    # reference asserts the same single Permutation failure
    # (`tests.rs:91-123`). Row 1488 is layout-pinned (VK-parity-tested).
    assert len(failures) == 1
    f = failures[0]
    assert isinstance(f, CopyFailure)
    assert f.left[:3] == ("advice", 0, 1488)
    assert f.right[:3] == ("instance", 0, 1)


def test_invalid_leaf_hash_instance(tree):
    """`tests.rs:232-266`."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    instances[0][0] = (instances[0][0] + 1) % FR_MOD
    failures = _prover(circuit, instances).verify()
    # one failure: entry leaf-hash output (advice col 0, row 122 — the
    # first Poseidon sponge's output cell) vs instance row 0
    assert len(failures) == 1
    f = failures[0]
    assert isinstance(f, CopyFailure)
    assert f.left[:3] == ("advice", 0, 122)
    assert f.right[:3] == ("instance", 0, 0)


def test_invalid_entry_balance(tree):
    """`tests.rs:158-229` — corrupt a witness balance: leaf hash no longer
    matches the instance and the balance sums break."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    circuit.entry_balances = [circuit.entry_balances[0] + 1, circuit.entry_balances[1]]
    failures = _prover(circuit, instances).verify()
    # exactly three failures, as in the reference (`tests.rs:158-229`):
    # the leaf hash no longer matches instance row 0, the recomputed root
    # hash breaks, and the currency-0 running sum lands one above the
    # committed root balance (556863 vs 556862).
    assert len(failures) == 3
    assert all(isinstance(f, CopyFailure) for f in failures)
    leaf_f = next(f for f in failures if f.right[:3] == ("instance", 0, 0))
    assert leaf_f.left[:3] == ("advice", 0, 122)
    root_f = next(f for f in failures if f.right[:3] == ("instance", 0, 1))
    assert root_f.left[:3] == ("advice", 0, 1488)
    bal_f = next(f for f in failures if f.right[:3] == ("instance", 0, 2))
    assert bal_f.left[:3] == ("advice", 2, 1326)
    assert bal_f.left[3] == 556863 and bal_f.right[3] == 556862


def test_out_of_range_balance_fails():
    """`tests.rs:269-299` — entry_16_overflow.csv holds a 2^112 balance: the
    8-byte running-sum decomposition truncates, so the final z_8 (= value
    >> 64 = 2^48) violates its constrain-to-zero constant copy."""
    tree = MerkleSumTree.from_csv(str(CSV / "entry_16_overflow.csv"))
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    failures = _prover(circuit).verify()
    # one failure: the final running-sum cell z_8 (advice col 0, row 254,
    # value 2^112 >> 64 = 2^48) violates its constrain-to-zero constant
    # (fixed col 2, row 246) — the reference asserts the same exact
    # ConstraintNotSatisfied location (`tests.rs:269-299`)
    assert len(failures) == 1
    f = failures[0]
    assert isinstance(f, CopyFailure)
    assert f.left[:4] == ("fixed", 2, 246, 0)
    assert f.right[:4] == ("advice", 0, 254, 1 << 48)


def test_non_binary_path_index(tree):
    """`tests.rs:302-395` — a path index of 2 violates the bool gate and the
    swap gates."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    circuit.path_indices = [2] + circuit.path_indices[1:]
    failures = _prover(circuit).verify()
    # exactly 4 failures, mirroring the reference list (`tests.rs:302-395`):
    # the bool gate, BOTH swap-gate polynomials (all three in the level-0
    # "assign nodes hashes per merkle tree level" region at offset 0), and
    # the resulting root-hash copy mismatch.
    gates = sorted(
        (f.gate, f.poly_index, f.region, f.offset)
        for f in failures
        if isinstance(f, GateFailure)
    )
    assert gates == [
        ("bool constraint", 0, "assign nodes hashes per merkle tree level", 0),
        ("swap constraint", 0, "assign nodes hashes per merkle tree level", 0),
        ("swap constraint", 1, "assign nodes hashes per merkle tree level", 0),
    ]
    copies = [f for f in failures if isinstance(f, CopyFailure)]
    assert len(copies) == 1 and copies[0].left[:3] == ("advice", 0, 1488)
    assert len(failures) == 4


def test_swapped_path_index(tree):
    """`tests.rs:398-433` — flipping a path bit computes a different root:
    the exposed root hash no longer matches the instance."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    circuit.path_indices = [1 - circuit.path_indices[0]] + circuit.path_indices[1:]
    failures = _prover(circuit).verify()
    # one failure: the (validly computed, but different) root hash fails
    # its copy to instance row 1 (`tests.rs:398-433`)
    assert len(failures) == 1
    f = failures[0]
    assert isinstance(f, CopyFailure)
    assert f.left[:3] == ("advice", 0, 1488)
    assert f.right[:3] == ("instance", 0, 1)


def test_layout_rendering():
    """dev-graph equivalent (`circuits/tests.rs:435-459`): the region log
    renders to SVG + table; the Poseidon permutation region occupies its
    documented 36 rows (halo2 Pow5 layout, SURVEY §2b)."""
    from circuits_halo2_tpu.models.layout import layout_table, render_layout_svg
    from circuits_halo2_tpu.models.mst_inclusion import (
        MstInclusionCircuit,
        compile_circuit,
    )
    from circuits_halo2_tpu.merkle.mst import MerkleSumTree
    from circuits_halo2_tpu.models.assignment import Assignment

    _, cs, config, _ = compile_circuit(4, 2, 8, 11)
    tree = MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    asn = Assignment(cs, 1 << 11, circuit.instances())
    circuit.synthesize(config, asn)

    names = [name for name, *_ in asn.regions_log]
    permutes = [r for r in asn.regions_log if r[0] == "permute state"]
    # 37 rows: offsets 0..36 — the reference layout's last offset is 36
    # (`circuits/tests.rs:113-115`), i.e. 64 rounds over half-rows + output
    assert permutes and all(h == 37 for _, _, h, _ in permutes)
    table = layout_table(asn)
    assert "permute state" in table and "usable" in table
    svg = render_layout_svg(asn)
    assert svg.startswith("<svg") and "permute state" in svg
    assert all(
        start + h <= asn.usable_rows for _, start, h, _ in asn.regions_log
    ), names[:5]

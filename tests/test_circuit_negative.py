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
    assert failures
    assert all(isinstance(f, CopyFailure) for f in failures)
    assert any(f.right[0] == "instance" for f in failures)


def test_invalid_leaf_hash_instance(tree):
    """`tests.rs:232-266`."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    instances[0][0] = (instances[0][0] + 1) % FR_MOD
    failures = _prover(circuit, instances).verify()
    assert failures and all(isinstance(f, CopyFailure) for f in failures)


def test_invalid_entry_balance(tree):
    """`tests.rs:158-229` — corrupt a witness balance: leaf hash no longer
    matches the instance and the balance sums break."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    circuit.entry_balances = [circuit.entry_balances[0] + 1, circuit.entry_balances[1]]
    failures = _prover(circuit, instances).verify()
    assert failures
    kinds = {type(f) for f in failures}
    assert CopyFailure in kinds


def test_out_of_range_balance_fails():
    """`tests.rs:269-299` — entry_16_overflow.csv holds a 2^112 balance: the
    8-byte running-sum decomposition truncates, so the final z_8 (= value
    >> 64 = 2^48) violates its constrain-to-zero constant copy."""
    tree = MerkleSumTree.from_csv(str(CSV / "entry_16_overflow.csv"))
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    failures = _prover(circuit).verify()
    assert failures
    assert any(
        isinstance(f, CopyFailure) and f.left[0] == "fixed" and f.left[3] == 0
        for f in failures
    )
    assert any(f.right[3] == 1 << 48 for f in failures if isinstance(f, CopyFailure))


def test_non_binary_path_index(tree):
    """`tests.rs:302-395` — a path index of 2 violates the bool gate and the
    swap gates."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    circuit.path_indices = [2] + circuit.path_indices[1:]
    failures = _prover(circuit).verify()
    gate_names = {f.gate for f in failures if isinstance(f, GateFailure)}
    assert "bool constraint" in gate_names
    assert "swap constraint" in gate_names


def test_swapped_path_index(tree):
    """`tests.rs:398-433` — flipping a path bit computes a different root:
    the exposed root hash no longer matches the instance."""
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    circuit.path_indices = [1 - circuit.path_indices[0]] + circuit.path_indices[1:]
    failures = _prover(circuit).verify()
    assert failures and all(isinstance(f, CopyFailure) for f in failures)


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

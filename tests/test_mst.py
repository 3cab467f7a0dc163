"""Merkle sum tree tests — golden-value parity with the reference.

Anchors (BASELINE.md):
- entry_16.csv root hash 0x177bf452...26d1, balances [556862, 556862]
  (`backend/src/tests.rs:265-268`)
- entry_13.csv (padded to 16): [385969, 459661]
- entry_17.csv (padded to 32, depth 5): [556863, 556863]
"""

from pathlib import Path

import pytest

from circuits_halo2_tpu.merkle.mst import (
    Entry,
    MerkleSumTree,
    Node,
    big_intify_username,
    parse_csv_to_entries,
)
from circuits_halo2_tpu.ops import field as F

CSV = Path(__file__).parent / "fixtures_csv"

GOLDEN_ROOT_16 = 0x177BF452AD139F067A64FE09FDC30AAE46144D60ABFA2AD9F0C70928E29A26D1


@pytest.fixture(scope="module")
def tree16():
    return MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))


def test_csv_parser(tree16):
    cryptos, entries = parse_csv_to_entries(str(CSV / "entry_16.csv"))
    assert [(c.name, c.chain) for c in cryptos] == [("ETH", "ETH"), ("USDT", "ETH")]
    assert len(entries) == 16
    assert entries[0].username == "dxGaEAii"
    assert entries[0].balances == [11888, 41163]


def test_golden_root_entry_16(tree16):
    assert tree16.root.balances == [556862, 556862]
    assert tree16.root.hash == GOLDEN_ROOT_16


def test_depth_and_structure(tree16):
    assert tree16.depth == 4
    assert [len(level) for level in tree16.nodes] == [16, 8, 4, 2, 1]


def test_proof_gen_and_verify_all_users(tree16):
    for i in range(16):
        proof = tree16.generate_proof(i)
        assert tree16.verify_proof(proof)
        assert len(proof.path_indices) == 4
        assert len(proof.sibling_middle_node_hash_preimages) == 3


def test_tampered_proof_fails(tree16):
    proof = tree16.generate_proof(0)
    proof.path_indices[0] = 1 - proof.path_indices[0]
    assert not tree16.verify_proof(proof)


def test_entry_13_zero_padding():
    tree = MerkleSumTree.from_csv(str(CSV / "entry_13.csv"))
    assert tree.depth == 4
    assert len(tree.entries) == 16
    assert tree.root.balances == [385969, 459661]
    assert tree.entries[15].is_zero()
    proof = tree.generate_proof(14)  # a padding entry
    assert tree.verify_proof(proof)


def test_entry_17_depth_5():
    tree = MerkleSumTree.from_csv(str(CSV / "entry_17.csv"))
    assert tree.depth == 5
    assert len(tree.entries) == 32
    assert tree.root.balances == [556863, 556863]


def test_sorted_tree_differs_but_sums_match(tree16):
    sorted_tree = MerkleSumTree.from_csv_sorted(str(CSV / "entry_16.csv"))
    assert sorted_tree.root.balances == tree16.root.balances
    assert sorted_tree.root.hash != tree16.root.hash
    idx = sorted_tree.index_of_username("dxGaEAii")
    assert sorted_tree.entries[idx].balances == [11888, 41163]


def test_update_leaf_matches_fresh_build(tree16):
    import copy

    tree = MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))
    new_root = tree.update_leaf("dxGaEAii", [11888 + 100, 41163 + 200])
    cryptos, entries = parse_csv_to_entries(str(CSV / "entry_16.csv"))
    entries[0] = Entry("dxGaEAii", [11988, 41363])
    fresh = MerkleSumTree.from_entries(entries, cryptos)
    assert new_root.hash == fresh.root.hash
    assert new_root.balances == fresh.root.balances


def test_preimage_getters_recompute(tree16):
    from circuits_halo2_tpu.ops import poseidon

    pre = tree16.get_middle_node_hash_preimage(1, 0)
    assert poseidon.hash_n(pre) == tree16.nodes[1][0].hash
    leaf_pre = tree16.get_leaf_node_hash_preimage(3)
    assert poseidon.hash_n(leaf_pre) == tree16.nodes[0][3].hash


def test_big_intify_username():
    assert big_intify_username("A") == 65
    assert big_intify_username("AB") == (65 << 8) | 66


def test_unknown_username_raises(tree16):
    with pytest.raises(KeyError):
        tree16.index_of_username("nope")

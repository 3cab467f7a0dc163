"""Device-resident tree build parity with the host MST."""

import numpy as np
import pytest

from circuits_halo2_tpu.merkle.device_tree import (
    build_device_tree,
    digests_to_limbs15,
    u64_to_limbs15,
)
from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.ops import poseidon_fast as PF

from pathlib import Path

CSV = Path(__file__).parent / "fixtures_csv"


def test_limb_conversions():
    vals = np.array([0, 1, (1 << 64) - 1, 123456789], dtype=np.uint64)
    limbs = u64_to_limbs15(vals)
    assert PF.limbs15_to_ints(limbs) == [int(v) for v in vals]

    rng = np.random.default_rng(1)
    digests = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    limbs = digests_to_limbs15(digests)
    want = [int.from_bytes(bytes(d), "big") for d in digests]
    # only bits < 15·18 = 270 are representable; digests are 256-bit, fine
    assert PF.limbs15_to_ints(limbs) == want


def test_device_tree_matches_host():
    tree = MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))
    digests = np.stack(
        [
            np.frombuffer(e.hashed_username.to_bytes(32, "big"), dtype=np.uint8)
            for e in tree.entries
        ]
    )
    balances = np.array(
        [[b for b in e.balances] for e in tree.entries], dtype=np.uint64
    )
    dmst = build_device_tree(digests, balances, use_pallas=False)
    root_h, root_b = dmst.root()
    assert root_h == tree.root.hash
    assert root_b == tree.root.balances
    assert dmst.depth == tree.depth


def test_device_tree_generate_proof_matches_host():
    tree = MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))
    digests = np.stack(
        [
            np.frombuffer(e.hashed_username.to_bytes(32, "big"), dtype=np.uint8)
            for e in tree.entries
        ]
    )
    balances = np.array(
        [[b for b in e.balances] for e in tree.entries], dtype=np.uint64
    )
    dmst = build_device_tree(digests, balances, use_pallas=False)
    for idx in (0, 5, 15):
        want = tree.generate_proof(idx)
        got = dmst.generate_proof(idx, tree.entries[idx])
        assert got.path_indices == want.path_indices
        assert (
            got.sibling_leaf_node_hash_preimage
            == want.sibling_leaf_node_hash_preimage
        )
        assert (
            got.sibling_middle_node_hash_preimages
            == want.sibling_middle_node_hash_preimages
        )
        assert got.root.hash == want.root.hash
        assert got.root.balances == want.root.balances
        assert tree.verify_proof(got)

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


# -- depth sweep parity (regression for the round-4 balance-drift bug) -------
#
# Round 4 accumulated Montgomery-form balance sums per level; at level L the
# sums reach 2^L·p and leave the [0, ~5p) envelope the redundant-limb hash
# kernel assumes, producing wrong hashes from the 6th reduction level up
# (zero balances masked it). Balances now stay in raw limb form (exact).
# These tests pin per-level device/host parity at depths beyond the boundary.

import os

from circuits_halo2_tpu.ops import poseidon as P_host
from circuits_halo2_tpu.ops.field import FR_MOD


def _host_levels(digests, bals):
    """Pure-python per-level (hashes, balance-sums) reference."""
    n = len(bals)
    us = [int.from_bytes(digests[i].tobytes(), "big") % FR_MOD for i in range(n)]
    hashes = [P_host.hash_n([us[i]] + [int(x) for x in bals[i]]) for i in range(n)]
    sums = [[int(x) for x in row] for row in bals]
    levels = [(hashes, sums)]
    while len(hashes) > 1:
        nh, ns = [], []
        for i in range(0, len(hashes), 2):
            s = [(a + b) % FR_MOD for a, b in zip(sums[i], sums[i + 1])]
            nh.append(P_host.hash_n(s + [hashes[i], hashes[i + 1]]))
            ns.append(s)
        hashes, sums = nh, ns
        levels.append((hashes, sums))
    return levels


@pytest.mark.parametrize("depth", [6, 7, 10])
def test_device_tree_deep_parity_per_level(depth):
    rng = np.random.default_rng(depth)
    n = 1 << depth
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    bals = rng.integers(1, 1 << 63, size=(n, 2), dtype=np.uint64)
    dmst = build_device_tree(digests, bals, use_pallas=False)
    host = _host_levels(digests, bals)
    for lvl, (hh, hs) in enumerate(host):
        dh = [
            v * PF.R15_INV % FR_MOD
            for v in PF.limbs15_to_ints(np.asarray(dmst.level_hashes[lvl]))
        ]
        assert dh == hh, f"hash mismatch at level {lvl} (depth {depth})"
        for c in range(2):
            ds = [
                v % FR_MOD
                for v in PF.limbs15_to_ints(
                    np.asarray(dmst.level_balances[lvl][c])
                )
            ]
            assert ds == [row[c] for row in hs], (
                f"balance mismatch at level {lvl} currency {c} (depth {depth})"
            )


@pytest.mark.parametrize("depth", [6, 10])
def test_device_tree_deep_proof_replay(depth):
    """Host Poseidon replay of a device-generated proof path (O(depth))."""
    from circuits_halo2_tpu.merkle.mst import Entry

    rng = np.random.default_rng(100 + depth)
    n = 1 << depth
    names = [f"user{i}" for i in range(n)]
    entries = [
        Entry(names[i], [int(b) for b in rng.integers(1, 1 << 63, size=2)])
        for i in range(n)
    ]
    digests = np.stack(
        [
            np.frombuffer(e.hashed_username.to_bytes(32, "big"), dtype=np.uint8)
            for e in entries
        ]
    )
    bals = np.array([e.balances for e in entries], dtype=np.uint64)
    dmst = build_device_tree(digests, bals, use_pallas=False)
    for idx in (0, n // 2, n - 1):
        proof = dmst.generate_proof(idx, entries[idx])
        assert MerkleSumTree.verify_proof(proof), f"replay failed idx={idx}"


@pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="2^16-leaf build; run with CIRCUITS_TPU_SLOW=1",
)
def test_device_tree_depth16_proof_replay():
    from circuits_halo2_tpu.merkle.mst import Entry

    rng = np.random.default_rng(16)
    n = 1 << 16
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    bals = rng.integers(1, 1 << 63, size=(n, 2), dtype=np.uint64)
    dmst = build_device_tree(digests, bals, use_pallas=False)
    entry = Entry("u0", [int(b) for b in bals[0]])
    entry.hashed_username = int.from_bytes(digests[0].tobytes(), "big") % PF.P
    proof = dmst.generate_proof(0, entry)
    assert MerkleSumTree.verify_proof(proof)

"""Merkle sum tree — witness-side data structure (no ZK).

Parity targets (semantics, not code) in the reference:
- Entry:      `zk_prover/src/merkle_sum_tree/entry.rs:8-72`
- Node:       `zk_prover/src/merkle_sum_tree/node.rs:8-85`
- Tree trait: `zk_prover/src/merkle_sum_tree/tree.rs:7-186`
- MerkleSumTree: `zk_prover/src/merkle_sum_tree/mst.rs:21-224`
- CSV parser: `zk_prover/src/merkle_sum_tree/utils/csv_parser.rs:8-59`
- builders:   `zk_prover/src/merkle_sum_tree/utils/build_tree.rs:5-78`

Hash rules:
- leaf hash   = Poseidon(keccak256(username) mod p, balance_0, …, balance_{N-1})
- middle hash = Poseidon(sumL_0+sumR_0, …, hashL, hashR)

The tree build is the witness-side hot loop: where the reference uses rayon
``par_iter`` over CPU cores, this build vectorizes every level's Poseidon
batch on the accelerator via ``ops.poseidon.hash_batch`` (one device call per
level, log-depth total).
"""

from __future__ import annotations

import csv as _csv
from bisect import bisect_left
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import field as F
from ..ops import field_jax as FJ
from ..ops import poseidon
from ..ops.keccak import keccak256


def big_intify_username(username: str) -> int:
    """UTF-8 big-endian bytes → integer (`operation_helpers.rs:5-8`)."""
    return int.from_bytes(username.encode("utf-8"), "big")


def big_uint_to_fp(x: int) -> int:
    """Arbitrary non-negative integer → Fr (mod p)."""
    return x % F.FR_MOD


@dataclass(frozen=True)
class Cryptocurrency:
    name: str
    chain: str


class Entry:
    """CEX user record: username + N_CURRENCIES balances.

    The username is keccak256-hashed to an integer at construction; the full
    256-bit digest is kept and reduced into Fr only when hashing the leaf.
    """

    __slots__ = ("username", "balances", "hashed_username")

    def __init__(self, username: str, balances: list[int]):
        self.username = username
        self.balances = list(balances)
        self.hashed_username = int.from_bytes(
            keccak256(username.encode("utf-8")), "big"
        )

    @classmethod
    def zero_entry(cls, n_currencies: int) -> "Entry":
        e = cls.__new__(cls)
        e.username = "0"
        e.balances = [0] * n_currencies
        e.hashed_username = 0
        return e

    def is_zero(self) -> bool:
        return self.hashed_username == 0 and all(b == 0 for b in self.balances)

    def compute_leaf(self) -> "Node":
        return Node.leaf(self.hashed_username, self.balances)

    def recompute_leaf(self, updated_balances: list[int]) -> "Node":
        self.balances = list(updated_balances)
        return Node.leaf(self.hashed_username, self.balances)

    def __eq__(self, other):
        return (
            isinstance(other, Entry)
            and self.username == other.username
            and self.balances == other.balances
        )


class Node:
    """MST node: hash plus per-currency balance sums (all Fr ints)."""

    __slots__ = ("hash", "balances")

    def __init__(self, hash_: int, balances: list[int]):
        self.hash = hash_
        self.balances = list(balances)

    @classmethod
    def leaf(cls, hashed_username: int, balances: list[int]) -> "Node":
        preimage = [big_uint_to_fp(hashed_username)] + [
            big_uint_to_fp(b) for b in balances
        ]
        return cls.leaf_node_from_preimage(preimage)

    @classmethod
    def middle(cls, left: "Node", right: "Node") -> "Node":
        preimage = [
            (l + r) % F.FR_MOD for l, r in zip(left.balances, right.balances)
        ] + [left.hash, right.hash]
        return cls.middle_node_from_preimage(preimage)

    @classmethod
    def leaf_node_from_preimage(cls, preimage: list[int]) -> "Node":
        return cls(poseidon.hash_n(preimage), preimage[1:])

    @classmethod
    def middle_node_from_preimage(cls, preimage: list[int]) -> "Node":
        return cls(poseidon.hash_n(preimage), preimage[:-2])

    @classmethod
    def init_empty(cls, n_currencies: int) -> "Node":
        return cls(0, [0] * n_currencies)

    def __eq__(self, other):
        return (
            isinstance(other, Node)
            and self.hash == other.hash
            and self.balances == other.balances
        )

    def __repr__(self):
        return f"Node(hash={hex(self.hash)}, balances={self.balances})"


@dataclass
class MerkleProof:
    """Witness bundle consumed by the inclusion circuit
    (`zk_prover/src/merkle_sum_tree/mod.rs:16-27`)."""

    entry: Entry
    root: Node
    sibling_leaf_node_hash_preimage: list[int]
    sibling_middle_node_hash_preimages: list[list[int]]
    path_indices: list[int]


def parse_csv_to_entries(path: str) -> tuple[list[Cryptocurrency], list[Entry]]:
    """Header: ``username,balance_<coin>_<chain>,...``; decimal balances."""
    with open(path, newline="") as f:
        reader = _csv.DictReader(f)
        headers = reader.fieldnames or []
        cryptocurrencies: list[Cryptocurrency] = []
        for header in headers[1:]:
            parts = header.split("_")
            if len(parts) == 3 and parts[0] == "balance":
                cryptocurrencies.append(Cryptocurrency(parts[1], parts[2]))
            else:
                raise ValueError(f"Invalid header: {header}")
        entries = []
        for record in reader:
            username = record.get("username")
            if username is None:
                raise ValueError("Username not found")
            balances = []
            for c in cryptocurrencies:
                key = f"balance_{c.name}_{c.chain}"
                if record.get(key) is None:
                    raise ValueError(f"Balance for {c.name} on {c.chain} not found")
                balances.append(int(record[key], 10))
            entries.append(Entry(username, balances))
    return cryptocurrencies, entries


# ---------------------------------------------------------------------------
# Batched (device) tree build
# ---------------------------------------------------------------------------

_R_INV = pow(1 << 256, -1, F.FR_MOD)


def _to_mont_arr(xs: list[int]) -> np.ndarray:
    from ..native import available as _native_ok, ints_to_limbs16

    if _native_ok():
        return ints_to_limbs16([x % F.FR_MOD for x in xs], to_mont=True)
    return FJ.ints_to_limbs([((x % F.FR_MOD) << 256) % F.FR_MOD for x in xs])


def _from_mont_arr(limbs) -> list[int]:
    from ..native import available as _native_ok, limbs16_to_ints

    if _native_ok():
        return limbs16_to_ints(np.asarray(limbs), from_mont=True)
    return [(v * _R_INV) % F.FR_MOD for v in FJ.limbs_to_ints(np.asarray(limbs))]


def _hash_columns(pre_cols: list[list[int]]) -> list[int]:
    """Hash N same-length messages given as L canonical-int columns.

    Prefers the native C++ sponge (fieldcc.cpp poseidon_hash_batch — the
    host-side analogue of the reference's rayon tree build,
    build_tree.rs:29-52); falls back to the batched device path."""
    from ..native import available as _native_ok, poseidon_hash_batch

    if _native_ok():
        return poseidon_hash_batch(list(zip(*pre_cols)), len(pre_cols))
    arr = np.stack([_to_mont_arr(c) for c in pre_cols])
    return _from_mont_arr(poseidon.hash_batch_chunked(arr))


def build_leaves_from_entries(entries: list[Entry]) -> list[Node]:
    """Batched Poseidon over all leaves — one native/device dispatch."""
    n_currencies = len(entries[0].balances)
    length = n_currencies + 1
    preimages = [
        [big_uint_to_fp(e.hashed_username)] + [big_uint_to_fp(b) for b in e.balances]
        for e in entries
    ]
    cols = [[pre[i] for pre in preimages] for i in range(length)]
    hashes = _hash_columns(cols)
    return [Node(h, pre[1:]) for h, pre in zip(hashes, preimages)]


def build_merkle_tree_from_leaves(
    leaves: list[Node], depth: int
) -> tuple[Node, list[list[Node]]]:
    """Level-by-level bottom-up build; each level is one batched hash call."""
    assert len(leaves) == 1 << depth, "leaf layer must be a power of two"
    n_currencies = len(leaves[0].balances)
    tree = [list(leaves)]
    for _level in range(1, depth + 1):
        below = tree[-1]
        pre_cols: list[list[int]] = [[] for _ in range(n_currencies + 2)]
        parents_balances = []
        for i in range(0, len(below), 2):
            l, r = below[i], below[i + 1]
            sums = [(a + b) % F.FR_MOD for a, b in zip(l.balances, r.balances)]
            parents_balances.append(sums)
            for c in range(n_currencies):
                pre_cols[c].append(sums[c])
            pre_cols[n_currencies].append(l.hash)
            pre_cols[n_currencies + 1].append(r.hash)
        hashes = _hash_columns(pre_cols)
        tree.append(
            [Node(h, b) for h, b in zip(hashes, parents_balances)]
        )
    return tree[depth][0], tree


class MerkleSumTree:
    """Concrete MST with CSV ingest, padding, incremental update, proofs."""

    def __init__(
        self,
        root: Node,
        nodes: list[list[Node]],
        depth: int,
        entries: list[Entry],
        cryptocurrencies: list[Cryptocurrency],
        is_sorted: bool,
    ):
        self.root = root
        self.nodes = nodes
        self.depth = depth
        self.entries = entries
        self.cryptocurrencies = cryptocurrencies
        self.is_sorted = is_sorted

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_csv(cls, path: str) -> "MerkleSumTree":
        cryptos, entries = parse_csv_to_entries(path)
        return cls.from_entries(entries, cryptos, is_sorted=False)

    @classmethod
    def from_csv_sorted(cls, path: str) -> "MerkleSumTree":
        cryptos, entries = parse_csv_to_entries(path)
        entries.sort(key=lambda e: e.username)
        return cls.from_entries(entries, cryptos, is_sorted=True)

    @classmethod
    def from_entries(
        cls,
        entries: list[Entry],
        cryptocurrencies: list[Cryptocurrency],
        is_sorted: bool = False,
    ) -> "MerkleSumTree":
        n_currencies = len(entries[0].balances)
        depth = (len(entries) - 1).bit_length() if len(entries) > 1 else 0
        target = 1 << depth
        if len(entries) < target:
            entries = entries + [
                Entry.zero_entry(n_currencies) for _ in range(target - len(entries))
            ]
        leaves = build_leaves_from_entries(entries)
        root, nodes = build_merkle_tree_from_leaves(leaves, depth)
        return cls(root, nodes, depth, entries, list(cryptocurrencies), is_sorted)

    @classmethod
    def from_params(cls, root, nodes, depth, entries, cryptocurrencies, is_sorted):
        return cls(root, nodes, depth, entries, cryptocurrencies, is_sorted)

    # -- accessors ----------------------------------------------------------

    def leaves(self) -> list[Node]:
        return self.nodes[0]

    def get_entry(self, index: int) -> Entry:
        return self.entries[index]

    # -- preimages ----------------------------------------------------------

    def get_leaf_node_hash_preimage(self, index: int) -> list[int]:
        e = self.entries[index]
        return [big_uint_to_fp(e.hashed_username)] + [
            big_uint_to_fp(b) for b in e.balances
        ]

    def get_middle_node_hash_preimage(self, level: int, index: int) -> list[int]:
        if level == 0 or level > self.depth:
            raise ValueError("Invalid depth")
        left = self.nodes[level - 1][2 * index]
        right = self.nodes[level - 1][2 * index + 1]
        return [
            (a + b) % F.FR_MOD for a, b in zip(left.balances, right.balances)
        ] + [left.hash, right.hash]

    # -- proofs -------------------------------------------------------------

    def generate_proof(self, index: int) -> MerkleProof:
        if index >= len(self.nodes[0]):
            raise IndexError("Index out of bounds")
        sibling_leaf_index = index + 1 if index % 2 == 0 else index - 1
        sibling_leaf_preimage = self.get_leaf_node_hash_preimage(sibling_leaf_index)
        sibling_middle_preimages = []
        path_indices = []
        current = index
        for level in range(self.depth):
            position = current % 2
            sibling = current - position + (1 - position)
            if level > 0:
                sibling_middle_preimages.append(
                    self.get_middle_node_hash_preimage(level, sibling)
                )
            path_indices.append(position)
            current //= 2
        return MerkleProof(
            entry=self.entries[index],
            root=self.root,
            sibling_leaf_node_hash_preimage=sibling_leaf_preimage,
            sibling_middle_node_hash_preimages=sibling_middle_preimages,
            path_indices=path_indices,
        )

    @staticmethod
    def verify_proof(proof: MerkleProof) -> bool:
        node = proof.entry.compute_leaf()
        sibling = Node.leaf_node_from_preimage(proof.sibling_leaf_node_hash_preimage)
        for level, bit in enumerate(proof.path_indices):
            if level > 0:
                sibling = Node.middle_node_from_preimage(
                    proof.sibling_middle_node_hash_preimages[level - 1]
                )
            sums = [
                (a + b) % F.FR_MOD for a, b in zip(node.balances, sibling.balances)
            ]
            if bit == 0:
                preimage = sums + [node.hash, sibling.hash]
            else:
                preimage = sums + [sibling.hash, node.hash]
            node = Node.middle_node_from_preimage(preimage)
        return node.hash == proof.root.hash and node.balances == proof.root.balances

    # -- updates ------------------------------------------------------------

    def update_leaf(self, username: str, new_balances: list[int]) -> Node:
        """O(depth) path rehash after a balance change."""
        index = self.index_of_username(username)
        self.nodes[0][index] = self.entries[index].recompute_leaf(new_balances)
        current = index
        for level in range(1, self.depth + 1):
            parent = current // 2
            left = self.nodes[level - 1][2 * parent]
            right = self.nodes[level - 1][2 * parent + 1]
            self.nodes[level][parent] = Node.middle(left, right)
            current = parent
        self.root = self.nodes[self.depth][0]
        return self.root

    def index_of_username(self, username: str) -> int:
        if not self.is_sorted:
            for i, e in enumerate(self.entries):
                if e.username == username:
                    return i
            raise KeyError("Username not found")
        keys = [e.username for e in self.entries]
        i = bisect_left(keys, username)
        if i < len(keys) and keys[i] == username:
            return i
        raise KeyError("Username not found")


def synthetic_merkle_proof(
    levels: int,
    n_currencies: int,
    entry: Entry,
    seed: int = 0,
    max_balance: int = 1 << 40,
) -> MerkleProof:
    """Consistent LEVELS-deep MerkleProof without building a 2^LEVELS tree.

    Sibling nodes along the path are synthesized bottom-up: each sibling
    middle-node preimage is built from freshly drawn child hashes/balances,
    so every preimage hashes to exactly the node the path consumes — the
    witness is indistinguishable (to the circuit) from one cut out of a full
    tree. O(levels) host hashes; used by deep-circuit tests and benches
    where the 2^20-leaf build itself is not the subject (reference scale:
    `zk_prover/benches/full_solvency_flow.rs:13-16`).

    Balances are kept < max_balance so the path sums stay inside the
    N_BYTES range checks at every level.
    """
    import random

    rng = random.Random(seed)

    def rand_fr() -> int:
        return rng.getrandbits(253) % F.FR_MOD

    def rand_bals() -> list[int]:
        return [rng.randrange(max_balance) for _ in range(n_currencies)]

    node = entry.compute_leaf()
    sibling_leaf_preimage = [rand_fr()] + rand_bals()
    sibling = Node.leaf_node_from_preimage(sibling_leaf_preimage)
    middles: list[list[int]] = []
    path: list[int] = []
    for level in range(levels):
        if level > 0:
            pre = rand_bals() + [rand_fr(), rand_fr()]
            # middle preimage stores the two CHILD balance sums summed;
            # draw children implicitly: pre[:-2] are already the sums
            sibling = Node.middle_node_from_preimage(pre)
            middles.append(pre)
        bit = rng.getrandbits(1)
        sums = [
            (a + b) % F.FR_MOD for a, b in zip(node.balances, sibling.balances)
        ]
        if bit == 0:
            preimage = sums + [node.hash, sibling.hash]
        else:
            preimage = sums + [sibling.hash, node.hash]
        node = Node.middle_node_from_preimage(preimage)
        path.append(bit)
    return MerkleProof(
        entry=entry,
        root=node,
        sibling_leaf_node_hash_preimage=sibling_leaf_preimage,
        sibling_middle_node_hash_preimages=middles,
        path_indices=path,
    )

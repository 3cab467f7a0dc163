"""Device-resident Merkle sum tree build — the large-scale witness path.

The object-per-node host tree (merkle/mst.py) round-trips Python integers at
every level, which dominates beyond ~2^16 leaves. This path keeps the whole
build on device:

- usernames (keccak digests) and u64 balances are converted to 15-bit limb
  arrays with vectorized numpy bit-slicing (no per-element Python);
- balance sums are accumulated in RAW (non-Montgomery) limb form: real
  liability sums are < 2^84 (2^20 entries × u64), so limb adds are exact at
  any depth with no modular drift. They are converted to the R15-Montgomery
  domain only where they enter a hash preimage, inside the same jitted chunk
  as the Poseidon dispatch (one REDC per node per level — negligible next to
  the 64-round permutation, and no extra device round trips);
- every level is one batched convert+Poseidon dispatch (pallas kernel) plus
  a pairwise balance addition;
- only the root (and any queried nodes) are converted back to integers.

Keeping sums Montgomery-resident and adding them per level (the round-4
design) is NOT sound: Montgomery values are full-width field elements, so
level-L sums reach 2^L·p and leave the [0, ~5p) envelope the redundant-limb
hash kernel assumes — wrong hashes from the 6th reduction level up. The raw
representation makes the accumulated value physically small instead.

Matches merkle/mst.py bit-exactly (tested); replaces the reference's rayon
build (`zk_prover/src/merkle_sum_tree/utils/build_tree.rs`) for the
2^20-entry benchmark scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import poseidon_fast as PF
from ..ops import poseidon_pallas2 as PPL2

P = F.FR_MOD
NL = PF.NLIMBS
LB = PF.LIMB_BITS
MASK = PF.MASK

# R15^2 mod p — device-side to-Montgomery conversion constant
_R2_15 = pow(PF.R15, 2, P)
_R2_LIMBS = PF.int_to_limbs15(_R2_15 % P).reshape(NL, 1)


def u64_to_limbs15(values: np.ndarray) -> np.ndarray:
    """(N,) uint64 → (NL, N) 15-bit limbs, fully vectorized."""
    values = values.astype(np.uint64)
    out = np.zeros((NL, len(values)), dtype=np.uint32)
    for i in range(5):  # 5 × 15 = 75 bits > 64
        out[i] = ((values >> np.uint64(LB * i)) & np.uint64(MASK)).astype(np.uint32)
    return out


def digests_to_limbs15(digests: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 big-endian keccak digests → (NL, N) limbs of the value
    mod p (the reduction happens on device via the Montgomery conversion)."""
    n = digests.shape[0]
    # big-endian bytes → little-endian u64 words
    le = digests[:, ::-1].copy()
    words = le.view("<u8").reshape(n, 4)  # 4 × u64, little-endian value
    out = np.zeros((NL, n), dtype=np.uint32)
    # value = sum words[k] << (64k); extract 15-bit limbs across boundaries
    for limb in range(NL):
        bit = LB * limb
        word, ofs = divmod(bit, 64)
        if word >= 4:
            break
        lo = (words[:, word] >> np.uint64(ofs)).astype(np.uint64)
        if ofs > 64 - LB and word + 1 < 4:
            hi = (words[:, word + 1] << np.uint64(64 - ofs)).astype(np.uint64)
            lo = lo | hi
        out[limb] = (lo & np.uint64(MASK)).astype(np.uint32)
    return out


@jax.jit
def _to_mont_dev(raw: jax.Array) -> jax.Array:
    """Raw-value limbs → R15-Montgomery via one REDC with R15² (values may
    exceed p; the congruence fold bounds them into the working envelope)."""
    return _to_mont_trace(raw)


class DeviceMst:
    """Full MST levels as device limb tensors (hashes + balance sums)."""

    def __init__(self, level_hashes, level_balances, depth, n_currencies,
                 user_limbs=None):
        self.level_hashes = level_hashes      # [(NL, n_l)] fat Montgomery
        self.level_balances = level_balances  # [(C, NL, n_l)] RAW limbs
        self.depth = depth
        self.n_currencies = n_currencies
        self.user_limbs = user_limbs          # (NL, n) leaf username hashes (Montgomery)

    @staticmethod
    def _val(col) -> int:
        """(NL, 1) fat-Montgomery limb column → canonical integer."""
        return PF.limbs15_to_ints(np.asarray(col))[0] * PF.R15_INV % P

    @staticmethod
    def _val_raw(col) -> int:
        """(NL, 1) raw limb column (balance sums) → integer (exact)."""
        return PF.limbs15_to_ints(np.asarray(col))[0]

    def root(self):
        """(root_hash, [root_balances]) as canonical integers."""
        h = PF.limbs15_to_ints(np.asarray(self.level_hashes[-1]))[0]
        bals = [
            PF.limbs15_to_ints(np.asarray(self.level_balances[-1][c]))[0] % P
            for c in range(self.n_currencies)
        ]
        return h * PF.R15_INV % P, bals

    def generate_proof(self, index: int, entry):
        """MerkleProof for leaf `index` (mirrors merkle/mst.py
        `MerkleSumTree.generate_proof`, reference `tree.rs:85-137`).

        `entry` is the host Entry for the leaf (usernames are not stored
        on device; the caller keeps them). O(depth) host conversions.
        """
        from .mst import MerkleProof, Node

        assert self.user_limbs is not None, "tree built without user limbs"
        c = self.n_currencies
        sib = index ^ 1
        sibling_leaf_preimage = [self._val(self.user_limbs[:, sib : sib + 1])] + [
            self._val_raw(self.level_balances[0][i, :, sib : sib + 1])
            for i in range(c)
        ]
        middles = []
        path = []
        for level in range(self.depth):
            cur = index >> level
            path.append(cur & 1)
            if level >= 1:
                s = cur ^ 1
                bal = [
                    self._val_raw(self.level_balances[level][i, :, s : s + 1])
                    for i in range(c)
                ]
                lh = self._val(self.level_hashes[level - 1][:, 2 * s : 2 * s + 1])
                rh = self._val(
                    self.level_hashes[level - 1][:, 2 * s + 1 : 2 * s + 2]
                )
                middles.append(bal + [lh, rh])
        root_h, root_b = self.root()
        return MerkleProof(
            entry=entry,
            root=Node(root_h, root_b),
            sibling_leaf_node_hash_preimage=sibling_leaf_preimage,
            sibling_middle_node_hash_preimages=middles,
            path_indices=path,
        )


def build_device_tree(
    hashed_usernames: np.ndarray,
    balances: np.ndarray,
    use_pallas: bool = True,
) -> DeviceMst:
    """hashed_usernames: (N, 32) uint8 keccak digests (or zeros);
    balances: (N, C) uint64. N must be a power of two."""
    n, ncur = balances.shape
    depth = (n - 1).bit_length()
    assert n == 1 << depth

    # whole-chunk jit: one device dispatch per chunk (the tunnel's per-op
    # latency dominates otherwise); inner pallas calls inline.
    # fixed chunk widths → a small closed set of compiled shapes regardless
    # of tree size (each new shape costs minutes through the remote compiler)
    chunks = (8192, PPL2.TILE) if use_pallas else (8192, 256)
    leaf_fn = _jitted_leaf(use_pallas)
    level_fn = _jitted_level(use_pallas)

    user_raw = jnp.asarray(digests_to_limbs15(hashed_usernames))
    bal_raw = jnp.stack(
        [jnp.asarray(u64_to_limbs15(balances[:, c])) for c in range(ncur)]
    )  # (C, NL, n) raw limbs — exact integers, stay raw for the whole build

    user_limbs = _chunked(_jitted_mont(), chunks, [user_raw], n)
    leaf_hashes = _chunked(leaf_fn, chunks, [user_raw, bal_raw], n)

    level_hashes = [leaf_hashes]
    level_balances = [bal_raw]

    for _ in range(depth):
        h = level_hashes[-1]
        b = level_balances[-1]
        left_h, right_h = h[:, 0::2], h[:, 1::2]
        left_b, right_b = b[:, :, 0::2], b[:, :, 1::2]
        sums = _add_dev(left_b, right_b)  # raw limb add — exact, no drift
        new_h = _chunked(level_fn, chunks, [sums, left_h, right_h], sums.shape[-1])
        level_hashes.append(new_h)
        level_balances.append(sums)

    return DeviceMst(level_hashes, level_balances, depth, ncur, user_limbs)


def build_device_tree_sorted(
    usernames: np.ndarray,
    hashed_usernames: np.ndarray,
    balances: np.ndarray,
    use_pallas: bool = True,
):
    """Sorted variant of the device build (reference ``from_csv_sorted``,
    `zk_prover/src/merkle_sum_tree/mst.rs:74-100` and the criterion stage
    `benches/full_solvency_flow.rs:35-50`): entries are ordered by username
    before the build so lookups can binary-search. The sort is a host
    ``np.argsort`` over the username array (vectorized — no per-element
    Python); the device build is identical.

    Returns (DeviceMst, order) where ``order[i]`` is the original index of
    the entry now at sorted position i."""
    order = np.argsort(np.asarray(usernames), kind="stable")
    tree = build_device_tree(
        hashed_usernames[order], balances[order], use_pallas=use_pallas
    )
    return tree, order


def _chunked(fn, chunks, arrays, width):
    """Dispatch `fn(*pieces)` over fixed-width slices of the last axis.

    Zero-pads the tail up to the smallest chunk so the set of compiled
    shapes is closed; padded lanes produce garbage that is sliced away."""
    outs = []
    ofs = 0
    while ofs < width:
        remaining = width - ofs
        size = next((c for c in chunks if c <= remaining), chunks[-1])
        pieces = []
        for a in arrays:
            piece = a[..., ofs : ofs + size]
            if piece.shape[-1] < size:
                pad = jnp.zeros(
                    piece.shape[:-1] + (size - piece.shape[-1],), jnp.uint32
                )
                piece = jnp.concatenate([piece, pad], axis=-1)
            pieces.append(piece)
        outs.append(fn(*pieces))
        ofs += size
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return out[..., :width]


def _to_mont_batch(raw: jax.Array) -> jax.Array:
    """(C, NL, w) raw limbs → Montgomery, limb axis moved first for REDC."""
    return jnp.moveaxis(_to_mont_trace(jnp.moveaxis(raw, 1, 0)), 0, 1)


def _to_mont_trace(raw: jax.Array) -> jax.Array:
    """Untraced body of _to_mont_dev, for inlining inside fused jits."""
    t = PF._fold(PF._mul_columns(raw, jnp.asarray(_R2_LIMBS), NL, 2 * NL))
    np15 = jnp.asarray(PF._NP15)
    p15 = jnp.asarray(PF._P15)
    k15 = jnp.asarray(PF._K15)
    m = PF._fold(PF._mul_columns(t[: PF.LOW], np15, PF.LOW, PF.LOW))[: PF.LOW]
    mn = PF._mul_columns(m, p15, PF.LOW, 2 * NL)
    s = PF._fold(PF._fold(t[: 2 * NL] + mn))
    carry = jnp.any(s[: PF.LOW] != 0, axis=0).astype(jnp.uint32)
    out = jnp.concatenate(
        [(s[PF.LOW] + carry)[None], s[PF.LOW + 1 : PF.LOW + NL]], axis=0
    )
    k15 = k15.reshape((PF.LOW,) + (1,) * (out.ndim - 1))
    folded = PF._fold(out[: PF.LOW] + out[PF.LOW] * k15)
    return folded[:NL]


@functools.lru_cache(maxsize=None)
def _jitted_mont():
    return jax.jit(_to_mont_trace)


@functools.lru_cache(maxsize=None)
def _jitted_leaf(use_pallas: bool):
    hashf = PPL2.hash_batch_pallas2 if use_pallas else PF.hash_batch15

    def f(user_raw, bal_raw):  # (NL, w) raw digests, (C, NL, w) raw balances
        u = _to_mont_trace(user_raw)
        b = _to_mont_batch(bal_raw)
        return hashf(jnp.concatenate([u[None], b], axis=0))

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_level(use_pallas: bool):
    hashf = PPL2.hash_batch_pallas2 if use_pallas else PF.hash_batch15

    def f(sums_raw, left_h, right_h):  # (C, NL, w) raw, 2×(NL, w) Montgomery
        s = _to_mont_batch(sums_raw)
        return hashf(jnp.concatenate([s, left_h[None], right_h[None]], axis=0))

    return jax.jit(f)


@jax.jit
def _add_dev(a, b):
    """Raw limb add with one carry fold. Inputs keep limbs ≤ 2^15+1, so the
    sum fits uint32 and limbs stay bounded under arbitrarily many levels;
    values are true integer sums (< 2^84 for u64 balances at 2^20 leaves),
    so no modular reduction is ever needed."""
    s = a + b
    lo = s & MASK
    hi = s >> LB
    return lo.at[..., 1:, :].set(lo[..., 1:, :] + hi[..., :-1, :])
"""Device-resident Merkle sum tree build — the large-scale witness path.

The object-per-node host tree (merkle/mst.py) round-trips Python integers at
every level, which dominates beyond ~2^16 leaves. This path keeps the whole
build on device:

- usernames (keccak digests) and u64 balances are converted to 15-bit limb
  arrays with vectorized numpy bit-slicing (no per-element Python);
- one device Montgomery-domain conversion (×R15² REDC) per input column;
- every level is one batched Poseidon dispatch (pallas kernel) plus a
  pairwise balance addition;
- only the root (and any queried nodes) are converted back to integers.

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
    folded = PF._fold(out[: PF.LOW] + out[PF.LOW] * k15)
    return folded[:NL]


class DeviceMst:
    """Full MST levels as device limb tensors (hashes + balance sums)."""

    def __init__(self, level_hashes, level_balances, depth, n_currencies,
                 user_limbs=None):
        self.level_hashes = level_hashes      # [(NL, n_l)] fat Montgomery
        self.level_balances = level_balances  # [(C, NL, n_l)]
        self.depth = depth
        self.n_currencies = n_currencies
        self.user_limbs = user_limbs          # (NL, n) leaf username hashes

    @staticmethod
    def _val(col) -> int:
        """(NL, 1) fat-Montgomery limb column → canonical integer."""
        return PF.limbs15_to_ints(np.asarray(col))[0] * PF.R15_INV % P

    def root(self):
        """(root_hash, [root_balances]) as canonical integers."""
        h = PF.limbs15_to_ints(np.asarray(self.level_hashes[-1]))[0]
        bals = [
            PF.limbs15_to_ints(np.asarray(self.level_balances[-1][c]))[0]
            * PF.R15_INV
            % P
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
            self._val(self.level_balances[0][i, :, sib : sib + 1])
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
                    self._val(self.level_balances[level][i, :, s : s + 1])
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
    base_fn = _jitted_hash(use_pallas)
    # fixed chunk widths → a small closed set of compiled shapes regardless
    # of tree size (each new shape costs minutes through the remote compiler)
    chunks = (8192, PPL2.TILE) if use_pallas else (8192, 256)

    def hash_fn(x):
        n_in = x.shape[-1]
        outs = []
        ofs = 0
        while ofs < n_in:
            remaining = n_in - ofs
            size = next((c for c in chunks if c <= remaining), chunks[-1])
            piece = x[..., ofs : ofs + size]
            if piece.shape[-1] < size:  # tail: pad up to the smallest chunk
                piece = jnp.concatenate(
                    [
                        piece,
                        jnp.zeros(
                            piece.shape[:-1] + (size - piece.shape[-1],),
                            jnp.uint32,
                        ),
                    ],
                    axis=-1,
                )
            outs.append(base_fn(piece))
            ofs += size
        return jnp.concatenate(outs, axis=-1)[..., :n_in] if len(outs) > 1 else outs[0][..., :n_in]

    def padded(x):
        return x  # chunking handles shapes

    user_limbs = _to_mont_dev(jnp.asarray(digests_to_limbs15(hashed_usernames)))
    bal_limbs = [
        _to_mont_dev(jnp.asarray(u64_to_limbs15(balances[:, c])))
        for c in range(ncur)
    ]
    leaf_pre = jnp.stack([user_limbs] + bal_limbs)  # (C+1, NL, n)
    leaf_hashes = hash_fn(padded(leaf_pre))[:, :n]

    level_hashes = [leaf_hashes]
    level_balances = [jnp.stack(bal_limbs)]  # (C, NL, n)

    for _ in range(depth):
        h = level_hashes[-1]
        b = level_balances[-1]
        left_h, right_h = h[:, 0::2], h[:, 1::2]
        left_b, right_b = b[:, :, 0::2], b[:, :, 1::2]
        sums = _add_dev(left_b, right_b)
        preimage = jnp.concatenate(
            [sums, left_h[None], right_h[None]], axis=0
        )  # (C+2, NL, n/2)
        new_h = hash_fn(padded(preimage))[:, : sums.shape[-1]]
        level_hashes.append(new_h)
        level_balances.append(sums)

    return DeviceMst(level_hashes, level_balances, depth, ncur, user_limbs)


@functools.lru_cache(maxsize=None)
def _jitted_hash(use_pallas: bool):
    fn = PPL2.hash_batch_pallas2 if use_pallas else PF.hash_batch15
    return jax.jit(fn)


@jax.jit
def _add_dev(a, b):
    s = a + b
    lo = s & MASK
    hi = s >> LB
    return lo.at[..., 1:, :].set(lo[..., 1:, :] + hi[..., :-1, :])
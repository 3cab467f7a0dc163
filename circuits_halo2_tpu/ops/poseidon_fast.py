"""Scan-free Poseidon — redundant 15-bit-limb Montgomery arithmetic.

The portable field path (field_jax) normalizes carries with ``lax.scan``,
whose ~130 sequential micro-steps per field-mul dominate wall clock on TPU
(the VPU work per step is trivial). This path eliminates every scan:

- field elements are 18 × 15-bit limbs in uint32, kept *redundant*
  (limb values may slightly exceed 2^15); R = 2^255.
- multiplication accumulates hi/lo-split column products (bounded < 2^22)
  and re-bounds limbs with parallel carry *folds* (shift-and-add, no
  propagation chains).
- Montgomery REDC computes m mod R from the folded low half, and resolves
  the divide-by-R carry with an all-zero test: after two joint folds the
  low 17 columns hold a multiple of R that is provably 0 or R (any 2R
  excess has already spilled into column 17), so carry = any(low != 0).
- values stay in [0, ~5p) (the fixed point of the REDC bound); exact
  canonical form is recovered host-side (mod p) on export only.

Poseidon needs only add/mul, so the relaxed no-subtraction arithmetic is
sufficient. Outputs match ops/poseidon bit-exactly after canonicalization
(tested). The exact 16-bit-limb path remains the general-purpose engine.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import poseidon as P_ref

P = F.FR_MOD
LIMB_BITS = 15
NLIMBS = 18           # 18 × 15 = 270 bits of headroom
LOW = 17              # R = 2^(15·17) = 2^255
R_BITS = LIMB_BITS * LOW
R15 = 1 << R_BITS
MASK = (1 << LIMB_BITS) - 1

NPRIME15 = (-pow(P, -1, R15)) % R15
R15_INV = pow(R15, -1, P)


def int_to_limbs15(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    return np.array(
        [(x >> (LIMB_BITS * i)) & MASK for i in range(nlimbs)], dtype=np.uint32
    )


def ints_to_limbs15(xs) -> np.ndarray:
    out = np.empty((NLIMBS, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        for i in range(NLIMBS):
            out[i, j] = (x >> (LIMB_BITS * i)) & MASK
    return out


def limbs15_to_ints(limbs) -> list[int]:
    limbs = np.asarray(limbs, dtype=np.uint64)
    out = []
    for col in limbs.T:
        v = 0
        for i in range(len(col) - 1, -1, -1):
            v = (v << LIMB_BITS) + int(col[i])
        out.append(v)
    return out


_NP15 = int_to_limbs15(NPRIME15, LOW).reshape(LOW, 1)
_P15 = int_to_limbs15(P, LOW).reshape(LOW, 1)
# K = 2^255 mod p, for the congruence fold that bounds value drift.
_K15 = int_to_limbs15(R15 % P, LOW).reshape(LOW, 1)


def _fold(cols: jax.Array) -> jax.Array:
    """One parallel carry fold; appends a carry-out column."""
    lo = cols & MASK
    hi = cols >> LIMB_BITS
    return jnp.concatenate(
        [lo, jnp.zeros_like(cols[:1])], axis=0
    ).at[1:].add(hi)


def _mul_columns(a: jax.Array, b: jax.Array, b_limbs: int, out_limbs: int) -> jax.Array:
    """Hi/lo-split schoolbook column products. a: (La, *batch) fat limbs
    (< 2^16); b: (b_limbs, …) fat limbs. Columns bounded < 2^22."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    la = a.shape[0]
    acc = jnp.zeros((out_limbs + 1,) + batch, dtype=jnp.uint32)
    for j in range(b_limbs):
        if j >= out_limbs:
            break
        width = min(la, out_limbs - j)
        prod = a[:width] * b[j]
        acc = acc.at[j : j + width].add(prod & MASK)
        acc = acc.at[j + 1 : j + width + 1].add(prod >> LIMB_BITS)
    return acc[:out_limbs]


def mont_mul15(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a·b·R15^{-1}, fully parallel (no carry chains)."""
    np_dev = jnp.asarray(_NP15)
    p_dev = jnp.asarray(_P15)
    # T = a·b over 36 columns, folded once → limbs < 2^15 + 2^7
    t = _fold(_mul_columns(a, b, NLIMBS, 2 * NLIMBS))  # 37 cols
    # m = (T mod R)·N' mod R (redundant, < R·(1+eps))
    m = _fold(_mul_columns(t[:LOW], np_dev, LOW, LOW))[:LOW]
    # T + m·p; two joint folds cap limbs at 2^15 (+1)
    mn = _mul_columns(m, p_dev, LOW, 2 * NLIMBS)  # 36 cols
    s = t[: 2 * NLIMBS] + mn
    s = _fold(_fold(s))  # 38 cols, limbs ≤ 2^15
    # low 17 columns hold 0 or exactly R → divide-by-R carry
    carry = jnp.any(s[:LOW] != 0, axis=0).astype(jnp.uint32)
    out = s[LOW : LOW + NLIMBS]
    out = out.at[0].add(carry)
    # congruence fold: value = low255 + limb17·2^255 ≡ low255 + limb17·K
    # (mod p); bounds the working values to a few p across round chains.
    k_dev = jnp.asarray(_K15)
    folded = _fold(out[:LOW].at[:LOW].add(out[LOW] * k_dev))
    return jnp.concatenate([folded, jnp.zeros_like(folded[:1])], axis=0)[:NLIMBS]


def add15(a: jax.Array, b: jax.Array) -> jax.Array:
    """Addition with one fold (no modular reduction — values drift within
    the analyzed [0, ~5p) envelope)."""
    la, lb = a.shape[0], b.shape[0]
    if la != lb:
        pad = jnp.zeros((abs(la - lb),) + (a if la < lb else b).shape[1:], jnp.uint32)
        if la < lb:
            a = jnp.concatenate([a, jnp.broadcast_to(pad, (lb - la,) + a.shape[1:])], axis=0)
        else:
            b = jnp.concatenate([b, jnp.broadcast_to(pad, (la - lb,) + b.shape[1:])], axis=0)
    return _fold(a + b)[:NLIMBS]


def pow5_15(x: jax.Array) -> jax.Array:
    x2 = mont_mul15(x, x)
    x4 = mont_mul15(x2, x2)
    return mont_mul15(x4, x)


# Montgomery-form (R15) constants
def _mont15(x: int) -> int:
    return (x * R15) % P


_RC15 = np.stack(
    [
        np.stack([int_to_limbs15(_mont15(c)).reshape(NLIMBS, 1) for c in row])
        for row in P_ref.ROUND_CONSTANTS
    ]
)
_MDS15 = np.stack(
    [
        np.stack([int_to_limbs15(_mont15(c)).reshape(NLIMBS, 1) for c in row])
        for row in P_ref.MDS
    ]
)


def _apply_mds(s0, s1):
    m = _MDS15
    n0 = add15(
        mont_mul15(jnp.asarray(m[0, 0]), s0), mont_mul15(jnp.asarray(m[0, 1]), s1)
    )
    n1 = add15(
        mont_mul15(jnp.asarray(m[1, 0]), s0), mont_mul15(jnp.asarray(m[1, 1]), s1)
    )
    return n0, n1


def permute_batch15(s0: jax.Array, s1: jax.Array):
    half = P_ref.R_FULL // 2

    def full_round(carry, rc):
        s0, s1 = carry
        s0 = pow5_15(add15(s0, rc[0]))
        s1 = pow5_15(add15(s1, rc[1]))
        return _apply_mds(s0, s1), None

    def partial_round(carry, rc):
        s0, s1 = carry
        s0 = pow5_15(add15(s0, rc[0]))
        s1 = add15(s1, rc[1])
        return _apply_mds(s0, s1), None

    rc = jnp.asarray(_RC15)
    (s0, s1), _ = jax.lax.scan(full_round, (s0, s1), rc[:half])
    (s0, s1), _ = jax.lax.scan(
        partial_round, (s0, s1), rc[half : half + P_ref.R_PARTIAL]
    )
    (s0, s1), _ = jax.lax.scan(full_round, (s0, s1), rc[half + P_ref.R_PARTIAL :])
    return s0, s1


def hash_batch15(inputs: jax.Array) -> jax.Array:
    """(L, 18, *batch) R15-Montgomery fat limbs → (18, *batch) digest."""
    length = inputs.shape[0]
    batch = inputs.shape[2:]
    s0 = jnp.zeros((NLIMBS,) + batch, jnp.uint32)
    cap = jnp.broadcast_to(
        jnp.asarray(int_to_limbs15(_mont15(length << 64)).reshape(NLIMBS, 1)),
        (NLIMBS,) + batch,
    ).astype(jnp.uint32)
    s1 = cap
    for i in range(length):
        s0 = add15(s0, inputs[i])
        s0, s1 = permute_batch15(s0, s1)
    return s0


hash_batch15_jit = jax.jit(hash_batch15)


def hash_many15(messages: list[list[int]]) -> list[int]:
    """Host convenience: hash N same-length messages via the fast path."""
    length = len(messages[0])
    n = len(messages)
    arr = np.zeros((length, NLIMBS, n), dtype=np.uint32)
    for j, msg in enumerate(messages):
        for i, w in enumerate(msg):
            arr[i, :, j] = int_to_limbs15(_mont15(w % P))
    out = hash_batch15_jit(jnp.asarray(arr))
    return [(v * R15_INV) % P for v in limbs15_to_ints(np.asarray(out))]

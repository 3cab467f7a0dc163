"""MXU-assisted Poseidon kernel (v3) — modular reduction as one bf16 matmul.

The v2 kernel (ops/poseidon_pallas2) is VPU-issue-bound: every Montgomery
product pays a REDC worth of VPU column arithmetic. This kernel feeds the
product columns to the MXU instead: a fixed (36 × 108) weight matrix whose
rows are the byte planes of (2^{15k+8h} mod p)'s 15-bit digits reduces the
36 u32 product columns (byte-split into 108 bf16 planes) straight to 18
limbs ≡ a·b (mod p) in ONE `dot_general` — no Montgomery domain at all:

    a·b = Σ_k cols_k·2^{15k},  cols_k = Σ_h byte_{k,h}·2^{8h}
        ≡ Σ_{k,h} byte_{k,h} · (2^{15k+8h} mod p)      (mod p)

and the right-hand side is exactly W @ byte_planes, computed per digit in
lo/hi byte rows so every f32 accumulation stays < 2^23 (exact). Digit 17
of every weight is zero (weights < p < 2^254), so the two re-bounding
folds never spill past limb 17.

**Measured outcome (round 5, v5e): bit-exact but SLOWER than v2** —
0.63M hashes/s vs 0.83M for ops/poseidon_pallas2 at the same L=4/2^16
shape. The microbench probe's per-mul win does not survive the full
sponge: the u32→bf16 byte-plane casts (324 VPU ops per reduction) plus
the 108-plane stack relayout cost more than the REDC column arithmetic
they replace, and the (36×108) matmul uses a sliver of the 128×128 MXU.
bf16's 8-bit exact-integer mantissa forces the byte split; f32/int8
variants overflow exactness bounds. v2 measures at ~85% of the VPU issue
roofline for 254-bit arithmetic, so single-chip Poseidon gains beyond it
require fewer ops, not a different unit — scaling past it is the sharded
multi-chip build (parallel/sharding). Kept as a validated experiment and
for MXU-heavy future hardware; NOT the production default.

Because every multiply re-reduces mod p, values live as plain residues
(no R factor): inputs are RAW 15-bit-limb values — the tree build feeds
keccak digests and balance sums directly, with no to-Montgomery
conversion — and outputs are raw residues (canonicalize host-side with
one `% p`).

Replaces the hot loop of `build_tree.rs:29-52` (SURVEY §2a #5) at the
2^20-entry benchmark scale.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from . import poseidon as P_ref
from . import poseidon_fast as PF
from . import poseidon_pallas2 as P2

P = F.FR_MOD
NL = PF.NLIMBS        # 18
LB = PF.LIMB_BITS     # 15
MASK = PF.MASK
NCOLS = 2 * NL        # product column count

SUB = P2.SUB
LANE = P2.LANE
TILE = P2.TILE

_fold = P2._fold
_mul_dyn = P2._mul_dyn
_mul_const = P2._mul_const
_acc_columns = P2._acc_columns


def _limbs_of(x: int, n: int) -> list[int]:
    return [(x >> (LB * i)) & MASK for i in range(n)]


def _reduce_w() -> np.ndarray:
    """(36, 108) reduction weights: rows = lo/hi byte planes of the 18
    digits; columns = (product column k, byte plane h)."""
    rows = []
    for k in range(NCOLS):
        for h in range(3):
            digs = _limbs_of(pow(2, 15 * k + 8 * h, P), NL)
            rows.append([d & 0xFF for d in digs] + [d >> 8 for d in digs])
    return np.array(rows, dtype=np.float32).T


_RW = _reduce_w()
R_IN = _RW.shape[1]  # 108

# plain (non-Montgomery) round constants and MDS
_RC_RAW = np.stack(
    [
        np.stack([np.array(_limbs_of(c, NL), dtype=np.uint32) for c in row])
        for row in P_ref.ROUND_CONSTANTS
    ]
).astype(np.uint32)
_MDS_RAW = [[_limbs_of(c, NL) for c in row] for row in P_ref.MDS]


def _split3(cols: list) -> list:
    """u32 columns (< 2^24) → 3 bf16 byte planes each."""

    def bf16(v):
        return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    planes = []
    for c in cols:
        planes.append(bf16(c & 0xFF))
        planes.append(bf16((c >> 8) & 0xFF))
        planes.append(bf16(c >> 16))
    return planes


def _mxu_reduce(w, cols: list) -> list:
    """36 product columns → 18 limbs ≡ value (mod p), one matmul."""
    d = jnp.stack(_split3(cols), axis=0)  # (108, SUB, LANE) bf16
    out = jax.lax.dot_general(
        w, d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (36, SUB, LANE)
    lo = out[:NL].astype(jnp.int32).astype(jnp.uint32)
    hi = out[NL:].astype(jnp.int32).astype(jnp.uint32)
    limbs = [lo[i] + (hi[i] << 8) for i in range(NL)]  # < 2^23; limb 17 == 0
    return _fold(_fold(limbs))[:NL]


def _mxu_mul(w, a: list, b: list) -> list:
    return _mxu_reduce(w, _mul_dyn(a, b))


def _mxu_sqr(w, a: list) -> list:
    return _mxu_reduce(w, P2._sqr_dyn(a))


def _pow5(w, x: list) -> list:
    x2 = _mxu_sqr(w, x)
    x4 = _mxu_sqr(w, x2)
    return _mxu_mul(w, x4, x)


def _mds_row(w, a: list, b: list, ca: list[int], cb: list[int]) -> list:
    """ca·a + cb·b with both constant products accumulated wide and ONE
    matmul reduction (lazy reduction, as in v2's _mds_row)."""
    zero = jnp.zeros_like(a[0])
    items: dict[int, list] = {}
    for ops, consts in ((a, ca), (b, cb)):
        for j, cj in enumerate(consts):
            if cj == 0:
                continue
            for i, xi in enumerate(ops):
                k = i + j
                if k >= NCOLS:
                    break
                items.setdefault(k, []).append((xi * cj, 1))
    acc = _acc_columns([zero] * (NCOLS + 1), items)[:NCOLS]
    return _mxu_reduce(w, acc)


def _sponge_kernel(length: int, w_ref, rc_ref, x_ref, out_ref):
    """ConstantLength<length> sponge, raw-residue domain, MXU reduction."""
    w = w_ref[...]

    def rc_limbs(r, word):
        return [rc_ref[r, word, i] for i in range(NL)]

    def add_rc(x, r, word):
        rc = rc_limbs(r, word)
        return _fold([xi + ri for xi, ri in zip(x, rc)])[:NL]

    def mds(s0, s1):
        n0 = _mds_row(w, s0, s1, _MDS_RAW[0][0], _MDS_RAW[0][1])
        n1 = _mds_row(w, s0, s1, _MDS_RAW[1][0], _MDS_RAW[1][1])
        return n0, n1

    def full_round(r, state):
        s0, s1 = state
        s0 = _pow5(w, add_rc(s0, r, 0))
        s1 = _pow5(w, add_rc(s1, r, 1))
        return mds(s0, s1)

    def partial_round(r, state):
        s0, s1 = state
        s0 = _pow5(w, add_rc(s0, r, 0))
        s1 = add_rc(s1, r, 1)
        return mds(s0, s1)

    cap_int = (length << 64) % P
    zero = jnp.zeros_like(x_ref[0, 0])
    s0 = [zero] * NL
    s1 = [zero + c for c in _limbs_of(cap_int, NL)]
    for word in range(length):
        s0 = _fold([a + x_ref[word, i] for i, a in enumerate(s0)])[:NL]
        state = (s0, s1)
        state = jax.lax.fori_loop(0, 4, full_round, state)
        state = jax.lax.fori_loop(4, 60, partial_round, state)
        state = jax.lax.fori_loop(60, 64, full_round, state)
        s0, s1 = state
    for i in range(NL):
        out_ref[i] = s0[i]


def hash_batch_mxu(inputs: jax.Array) -> jax.Array:
    """(L, NL, N) RAW fat limbs, N % TILE == 0 → (NL, N) raw digests."""
    length, _, n = inputs.shape
    m = n // LANE
    x = inputs.reshape(length, NL, m, LANE)
    grid = (m // SUB,)
    rc = jnp.asarray(_RC_RAW)
    w = jnp.asarray(_RW).astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_sponge_kernel, length),
        grid=grid,
        in_specs=[
            pl.BlockSpec((36, R_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 2, NL), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (length, NL, SUB, LANE),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NL, m, LANE), jnp.uint32),
        interpret=P2._INTERPRET,
    )(w, rc, x)
    return out.reshape(NL, n)


def hash_many_mxu(messages: list[list[int]]) -> list[int]:
    """Host convenience: hash N same-length messages (pads N to TILE)."""
    length = len(messages[0])
    n = len(messages)
    npad = ((n + TILE - 1) // TILE) * TILE
    arr = np.zeros((length, NL, npad), dtype=np.uint32)
    for j, msg in enumerate(messages):
        for i, v in enumerate(msg):
            arr[i, :, j] = PF.int_to_limbs15(v % P)
    out = np.asarray(hash_batch_mxu(jnp.asarray(arr)))
    return [v % P for v in PF.limbs15_to_ints(out[:, :n])]

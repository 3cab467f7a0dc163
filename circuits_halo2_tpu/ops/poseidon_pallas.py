"""Pallas TPU kernel for the Poseidon permutation.

The XLA-graph paths (ops/poseidon, ops/poseidon_fast) materialize every
intermediate limb tensor through HBM between the ~1500 element-wise ops of
a permutation, leaving the VPU memory-bound. This kernel keeps the whole
sponge state and round computation resident in VMEM: one `pallas_call`
per hash batch, a `fori_loop` over the 64 rounds, round constants streamed
from a VMEM table.

Arithmetic is the scan-free redundant 15-bit-limb Montgomery scheme of
ops/poseidon_fast (see its module docstring for the bound analysis); limbs
ride the lane dimension in (18, TILE) uint32 blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from . import poseidon as P_ref
from . import poseidon_fast as PF

P = F.FR_MOD
NL = PF.NLIMBS       # 18
LOW = PF.LOW         # 17
MASK = PF.MASK       # 2^15 - 1
LB = PF.LIMB_BITS    # 15

TILE = 1024          # batch lanes per grid step


def _np_c(x: int, limbs: int) -> np.ndarray:
    return PF.int_to_limbs15(x, limbs).astype(np.uint32)


_NP15 = _np_c(PF.NPRIME15, LOW).reshape(LOW, 1)
_P15 = _np_c(P, LOW).reshape(LOW, 1)
_K15 = _np_c(PF.R15 % P, LOW).reshape(LOW, 1)
# round constants in R15-Montgomery form: (64, 2, NL)
_RC = np.stack(
    [
        np.stack([_np_c((c * PF.R15) % P, NL) for c in row])
        for row in P_ref.ROUND_CONSTANTS
    ]
).astype(np.uint32)
_MDS = np.stack(
    [
        np.stack([_np_c((c * PF.R15) % P, NL) for c in row])
        for row in P_ref.MDS
    ]
).astype(np.uint32)


def _zeros_rows(ref_cols, n):
    return jnp.zeros((n,) + ref_cols.shape[1:], jnp.uint32)


def _fold(cols):
    """Parallel carry fold, extending with a carry-out column.

    Scatter-free (Mosaic has no scatter-add): the carry vector is shifted by
    concatenation and added."""
    lo = cols & MASK
    hi = cols >> LB
    lo_ext = jnp.concatenate([lo, _zeros_rows(cols, 1)], axis=0)
    hi_ext = jnp.concatenate([_zeros_rows(cols, 1), hi], axis=0)
    return lo_ext + hi_ext


def _shift_add(acc, part, offset, out_limbs):
    """acc += part placed at row `offset` (rows beyond out_limbs dropped)."""
    rows = part.shape[0]
    keep = min(rows, out_limbs - offset)
    if keep <= 0:
        return acc
    part = part[:keep]
    pieces = []
    if offset > 0:
        pieces.append(_zeros_rows(part, offset))
    pieces.append(part)
    tail = out_limbs - offset - keep
    if tail > 0:
        pieces.append(_zeros_rows(part, tail))
    return acc + (pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0))


def _mul_cols(a, b_const, b_limbs, out_limbs):
    """Column products of a (fat limbs, VMEM value) with a constant-limb
    vector b (numpy (b_limbs, 1)). Scatter-free."""
    acc = jnp.zeros((out_limbs,) + a.shape[1:], jnp.uint32)
    for j in range(b_limbs):
        if j >= out_limbs:
            break
        prod = a * b_const[j]
        acc = _shift_add(acc, prod & MASK, j, out_limbs)
        acc = _shift_add(acc, prod >> LB, j + 1, out_limbs)
    return acc


def _mul_cols_dyn(a, b):
    """Column products of two VMEM values a (NL, T) and b (NL, T)."""
    out_limbs = 2 * NL
    acc = jnp.zeros((out_limbs,) + a.shape[1:], jnp.uint32)
    for j in range(NL):
        prod = a * b[j]
        acc = _shift_add(acc, prod & MASK, j, out_limbs)
        acc = _shift_add(acc, prod >> LB, j + 1, out_limbs)
    return acc


def _redc(t, np15, p15, k15):
    """Scan-free Montgomery reduction of folded 512-bit columns t (36+, T)."""
    m = _fold(_mul_cols(t[:LOW], np15, LOW, LOW))[:LOW]  # mod R
    mn = _mul_cols(m, p15, LOW, 2 * NL)
    s = _fold(_fold(t[: 2 * NL] + mn))
    carry = jnp.any(s[:LOW] != 0, axis=0).astype(jnp.uint32)
    out = jnp.concatenate(
        [(s[LOW] + carry)[None], s[LOW + 1 : LOW + NL]], axis=0
    )
    # congruence fold keeps values bounded (limb 17 · 2^255 ≡ limb17 · K)
    folded = _fold(out[:LOW] + out[LOW] * k15)
    return folded[:NL]


def _mont_mul(a, b, C):
    return _redc(_fold(_mul_cols_dyn(a, b)), *C)


def _mont_mul_const(a, c_limbs, C):
    return _redc(_fold(_mul_cols(a, c_limbs, NL, 2 * NL)), *C)


def _add(a, b):
    # top carry column is provably zero (values < 2^258 << 2^270)
    return _fold(a + b)[:NL]


def _pow5(x, C):
    x2 = _mont_mul(x, x, C)
    x4 = _mont_mul(x2, x2, C)
    return _mont_mul(x4, x, C)


def _permute_kernel(rc_ref, consts_ref, s0_ref, s1_ref, o0_ref, o1_ref):
    np15 = consts_ref[0, :LOW].reshape(LOW, 1)
    p15 = consts_ref[1, :LOW].reshape(LOW, 1)
    k15 = consts_ref[2, :LOW].reshape(LOW, 1)
    C = (np15, p15, k15)
    mds = [
        [consts_ref[3 + 2 * i + j, :].reshape(NL, 1) for j in range(2)]
        for i in range(2)
    ]

    def mds_layer(a, b):
        n0 = _add(_mont_mul_const(a, mds[0][0], C), _mont_mul_const(b, mds[0][1], C))
        n1 = _add(_mont_mul_const(a, mds[1][0], C), _mont_mul_const(b, mds[1][1], C))
        return n0, n1

    def full_round(r, state):
        s0, s1 = state
        rc0 = rc_ref[r, 0, :].reshape(NL, 1)
        rc1 = rc_ref[r, 1, :].reshape(NL, 1)
        s0 = _pow5(_add(s0, jnp.broadcast_to(rc0, s0.shape)), C)
        s1 = _pow5(_add(s1, jnp.broadcast_to(rc1, s1.shape)), C)
        return mds_layer(s0, s1)

    def partial_round(r, state):
        s0, s1 = state
        rc0 = rc_ref[r, 0, :].reshape(NL, 1)
        rc1 = rc_ref[r, 1, :].reshape(NL, 1)
        s0 = _pow5(_add(s0, jnp.broadcast_to(rc0, s0.shape)), C)
        s1 = _add(s1, jnp.broadcast_to(rc1, s1.shape))
        return mds_layer(s0, s1)

    state = (s0_ref[:], s1_ref[:])
    state = jax.lax.fori_loop(0, 4, full_round, state)
    state = jax.lax.fori_loop(4, 60, partial_round, state)
    state = jax.lax.fori_loop(60, 64, full_round, state)
    o0_ref[:] = state[0]
    o1_ref[:] = state[1]


# packed constant table: rows 0-2 = N', p, K (padded to NL); rows 3-6 = MDS
_CONSTS = np.zeros((7, NL), dtype=np.uint32)
_CONSTS[0, :LOW] = _NP15[:, 0]
_CONSTS[1, :LOW] = _P15[:, 0]
_CONSTS[2, :LOW] = _K15[:, 0]
for _i in range(2):
    for _j in range(2):
        _CONSTS[3 + 2 * _i + _j] = _MDS[_i, _j]


import os

_INTERPRET = bool(os.environ.get("CIRCUITS_TPU_PALLAS_INTERPRET")) or not any(
    d.platform in ("tpu", "axon") for d in jax.devices()
)


@functools.partial(jax.jit, static_argnames=())
def permute_tiles(s0: jax.Array, s1: jax.Array):
    """Batched permutation via pallas: s0, s1 are (NL, N) with N % TILE == 0."""
    n = s0.shape[1]
    grid = (n // TILE,)
    rc = jnp.asarray(_RC)
    consts = jnp.asarray(_CONSTS)
    return pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, 2, NL), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, NL), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NL, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NL, n), jnp.uint32),
            jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        ],
        interpret=_INTERPRET,
    )(rc, consts, s0, s1)


def hash_batch_pallas(inputs: jax.Array) -> jax.Array:
    """(L, NL, N) R15-Montgomery fat limbs → (NL, N) digests. N % TILE == 0."""
    length, _, n = inputs.shape
    s0 = jnp.zeros((NL, n), jnp.uint32)
    cap = jnp.broadcast_to(
        jnp.asarray(_np_c((length << 64) * PF.R15 % P, NL).reshape(NL, 1)), (NL, n)
    ).astype(jnp.uint32)
    s1 = cap
    for i in range(length):
        s0 = PF.add15(s0, inputs[i])[:NL]
        s0, s1 = permute_tiles(s0, s1)
    return s0


def hash_many_pallas(messages: list[list[int]]) -> list[int]:
    length = len(messages[0])
    n = len(messages)
    pad = (-n) % TILE
    arr = np.zeros((length, NL, n + pad), dtype=np.uint32)
    for j, msg in enumerate(messages):
        for i, w in enumerate(msg):
            arr[i, :, j] = PF.int_to_limbs15((w % P) * PF.R15 % P)
    out = np.asarray(hash_batch_pallas(jnp.asarray(arr)))[:, :n]
    return [(v * PF.R15_INV) % P for v in PF.limbs15_to_ints(out)]

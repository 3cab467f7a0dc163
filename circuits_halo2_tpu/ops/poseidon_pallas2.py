"""Pallas Poseidon kernel, per-limb register layout (v2) — the production
hash engine. Validated bit-exact against the host Poseidon on TPU v5e
(491k hashes/s vs 258k for v1, 34k for the XLA-graph path).

The v1 kernel (ops/poseidon_pallas) stores a field element as an
(18, TILE) tensor; limb-shift accumulations become cross-sublane
concatenations, which Mosaic lowers to relayout traffic. Here a field
element is a *Python list* of 18 per-limb arrays, each one (SUB, 128)
vreg-shaped block: limb shifts are list re-indexing (free at trace time),
every emitted op is a pure lane-wise VPU instruction, and all multiply
constants (p, N', K, MDS) embed as immediate scalars.

Same redundant 15-bit-limb Montgomery scheme as ops/poseidon_fast.
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

P = F.FR_MOD
NL = PF.NLIMBS
LOW = PF.LOW
MASK = PF.MASK
LB = PF.LIMB_BITS

SUB = int(os.environ.get("POSEIDON_SUB", "8"))
LANE = 128
TILE = SUB * LANE


def _limbs_of(x: int, n: int) -> list[int]:
    return [(x >> (LB * i)) & MASK for i in range(n)]


_NP15 = _limbs_of(PF.NPRIME15, LOW)
_P15 = _limbs_of(P, LOW)
_K15 = _limbs_of(PF.R15 % P, LOW)
_MDS = [[_limbs_of((c * PF.R15) % P, NL) for c in row] for row in P_ref.MDS]
_RC = np.stack(
    [
        np.stack(
            [
                np.array(_limbs_of((c * PF.R15) % P, NL), dtype=np.uint32)
                for c in row
            ]
        )
        for row in P_ref.ROUND_CONSTANTS
    ]
).astype(np.uint32)


def _fold(cols: list) -> list:
    lo = [c & MASK for c in cols]
    hi = [c >> LB for c in cols]
    out = [lo[0]]
    for i in range(1, len(cols)):
        out.append(lo[i] + hi[i - 1])
    out.append(hi[-1])
    return out


# Grouped accumulation: redundant limbs are bounded by 2^15 + 2^7 (one fold
# of < 2^22 columns), so a single product is < (2^15+2^7)^2 ≈ 1.008·2^30 and
# THREE products (weight 3) sum to < 3.25e9 < 2^32 — they can accumulate in
# a plain uint32 before one lo/hi split. This removes ~40% of the VPU ops of
# the previous split-every-product scheme (the kernel is VPU-issue-bound).
# Doubled off-diagonal squaring terms count as weight 2.
_GROUP_W = 3


def _acc_columns(acc: list, items: dict[int, list]) -> list:
    """Accumulate per-column (product, weight) lists into acc with grouped
    lo/hi splits. items: {column k: [(array, weight), ...]}."""
    for k, plist in items.items():
        g = None
        w = 0
        for p, pw in plist:
            if g is not None and w + pw > _GROUP_W:
                acc[k] = acc[k] + (g & MASK)
                acc[k + 1] = acc[k + 1] + (g >> LB)
                g, w = None, 0
            g = p if g is None else g + p
            w += pw
        if g is not None:
            acc[k] = acc[k] + (g & MASK)
            if k + 1 < len(acc):
                acc[k + 1] = acc[k + 1] + (g >> LB)
    return acc


def _mul_const(a: list, b: list[int], out_limbs: int) -> list:
    """Column products of limb-list a with an immediate constant b."""
    zero = jnp.zeros_like(a[0])
    items: dict[int, list] = {}
    for j, bj in enumerate(b):
        if bj == 0 or j >= out_limbs:
            continue
        for i, ai in enumerate(a):
            k = i + j
            if k >= out_limbs:
                break
            items.setdefault(k, []).append((ai * bj, 1))
    return _acc_columns([zero] * (out_limbs + 1), items)[:out_limbs]


def _mul_dyn(a: list, b: list) -> list:
    zero = jnp.zeros_like(a[0])
    out_limbs = len(a) + len(b)
    items: dict[int, list] = {}
    for j, bj in enumerate(b):
        for i, ai in enumerate(a):
            items.setdefault(i + j, []).append((ai * bj, 1))
    return _acc_columns([zero] * (out_limbs + 1), items)[:out_limbs]


def _sqr_dyn(a: list) -> list:
    """Squaring: off-diagonal column products a_i·a_j (i<j) computed once
    and accumulated at weight 2 (as prod+prod inside a grouped uint32
    accumulator — a doubled product is < 2^31.1, within the group budget)."""
    zero = jnp.zeros_like(a[0])
    out_limbs = 2 * len(a)
    items: dict[int, list] = {}
    for i, ai in enumerate(a):
        items.setdefault(2 * i, []).append((ai * ai, 1))
        for j in range(i + 1, len(a)):
            prod = ai * a[j]
            items.setdefault(i + j, []).append((prod + prod, 2))
    return _acc_columns([zero] * (out_limbs + 1), items)[:out_limbs]


def _redc(t: list) -> list:
    m = _fold(_mul_const(t[:LOW], _NP15, LOW))[:LOW]
    mn = _mul_const(m, _P15, 2 * NL)
    s = [a + b for a, b in zip(t[: 2 * NL], mn)]
    s = _fold(_fold(s))
    nz = s[0]
    for c in s[1:LOW]:
        nz = nz | c
    carry = (nz != 0).astype(jnp.uint32)
    out = [s[LOW] + carry] + s[LOW + 1 : LOW + NL]
    # congruence fold of the top limb
    kpart = [out[LOW] * k for k in _K15]
    low = [a + b for a, b in zip(out[:LOW], kpart)]
    return _fold(low)[:NL]


def _mont_mul(a: list, b: list) -> list:
    return _redc(_fold(_mul_dyn(a, b)))


def _mont_sqr(a: list) -> list:
    return _redc(_fold(_sqr_dyn(a)))


def _mont_mul_const(a: list, c: list[int]) -> list:
    return _redc(_fold(_mul_const(a, c, 2 * NL)))


def _add(a: list, b: list) -> list:
    return _fold([x + y for x, y in zip(a, b)])[:NL]


def _pow5(x: list) -> list:
    x2 = _mont_sqr(x)
    x4 = _mont_sqr(x2)
    return _mont_mul(x4, x)


def _mds_row(a: list, b: list, ca: list[int], cb: list[int]) -> list:
    """One MDS output word ca·a + cb·b with LAZY reduction: both constant
    products accumulate into one wide column vector, then a single REDC —
    2 REDCs per MDS layer instead of 4. REDC(x+y) ≡ REDC(x)+REDC(y) mod p.
    Grouped accumulation over both products: ≤ 24 groups per column keeps
    column sums < 2^22 (the _fold bound)."""
    zero = jnp.zeros_like(a[0])
    items: dict[int, list] = {}
    for ops, consts in ((a, ca), (b, cb)):
        for j, cj in enumerate(consts):
            if cj == 0:
                continue
            for i, xi in enumerate(ops):
                k = i + j
                if k >= 2 * NL:
                    break
                items.setdefault(k, []).append((xi * cj, 1))
    acc = _acc_columns([zero] * (2 * NL + 1), items)[: 2 * NL]
    return _redc(_fold(acc))


def _mds_layer(a: list, b: list):
    n0 = _mds_row(a, b, _MDS[0][0], _MDS[0][1])
    n1 = _mds_row(a, b, _MDS[1][0], _MDS[1][1])
    return n0, n1


def _permute_kernel(rc_ref, s0_ref, s1_ref, o0_ref, o1_ref):
    def read(ref):
        return [ref[i] for i in range(NL)]

    def rc_limbs(r, word):
        return [rc_ref[r, word, i] for i in range(NL)]

    def add_rc(x, r, word):
        rc = rc_limbs(r, word)
        return _fold([xi + ri for xi, ri in zip(x, rc)])[:NL]

    def full_round(r, state):
        s0, s1 = state
        s0 = _pow5(add_rc(s0, r, 0))
        s1 = _pow5(add_rc(s1, r, 1))
        return _mds_layer(s0, s1)

    def partial_round(r, state):
        s0, s1 = state
        s0 = _pow5(add_rc(s0, r, 0))
        s1 = add_rc(s1, r, 1)
        return _mds_layer(s0, s1)

    state = (read(s0_ref), read(s1_ref))
    state = jax.lax.fori_loop(0, 4, full_round, state)
    state = jax.lax.fori_loop(4, 60, partial_round, state)
    state = jax.lax.fori_loop(60, 64, full_round, state)
    s0, s1 = state
    for i in range(NL):
        o0_ref[i] = s0[i]
        o1_ref[i] = s1[i]


_INTERPRET = bool(os.environ.get("CIRCUITS_TPU_PALLAS_INTERPRET")) or not any(
    d.platform in ("tpu", "axon") for d in jax.devices()
)


@functools.partial(jax.jit, static_argnames=())
def permute_tiles(s0: jax.Array, s1: jax.Array):
    """s0, s1: (NL, M, LANE) with M % SUB == 0."""
    m = s0.shape[1]
    grid = (m // SUB,)
    rc = jnp.asarray(_RC)
    return pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, 2, NL), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NL, m, LANE), jnp.uint32),
            jax.ShapeDtypeStruct((NL, m, LANE), jnp.uint32),
        ],
        interpret=_INTERPRET,
    )(rc, s0, s1)


def _sponge_kernel(length: int, rc_ref, x_ref, out_ref):
    """Full ConstantLength<length> sponge in one kernel: absorb each message
    word into s0 and permute, state resident in vregs throughout (no HBM
    roundtrips between the L permutations)."""

    def rc_limbs(r, word):
        return [rc_ref[r, word, i] for i in range(NL)]

    def add_rc(x, r, word):
        rc = rc_limbs(r, word)
        return _fold([xi + ri for xi, ri in zip(x, rc)])[:NL]

    def full_round(r, state):
        s0, s1 = state
        s0 = _pow5(add_rc(s0, r, 0))
        s1 = _pow5(add_rc(s1, r, 1))
        return _mds_layer(s0, s1)

    def partial_round(r, state):
        s0, s1 = state
        s0 = _pow5(add_rc(s0, r, 0))
        s1 = add_rc(s1, r, 1)
        return _mds_layer(s0, s1)

    cap_int = (length << 64) * PF.R15 % P
    zero = jnp.zeros_like(x_ref[0, 0])
    s0 = [zero] * NL
    s1 = [zero + c for c in _limbs_of(cap_int, NL)]
    for w in range(length):
        s0 = _fold([a + x_ref[w, i] for i, a in enumerate(s0)])[:NL]
        state = (s0, s1)
        state = jax.lax.fori_loop(0, 4, full_round, state)
        state = jax.lax.fori_loop(4, 60, partial_round, state)
        state = jax.lax.fori_loop(60, 64, full_round, state)
        s0, s1 = state
    for i in range(NL):
        out_ref[i] = s0[i]


def hash_batch_pallas2(inputs: jax.Array) -> jax.Array:
    """(L, NL, N) fat limbs, N % TILE == 0 → (NL, N) digests."""
    length, _, n = inputs.shape
    m = n // LANE
    x = inputs.reshape(length, NL, m, LANE)
    grid = (m // SUB,)
    rc = jnp.asarray(_RC)
    out = pl.pallas_call(
        functools.partial(_sponge_kernel, length),
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, 2, NL), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (length, NL, SUB, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NL, m, LANE), jnp.uint32),
        interpret=_INTERPRET,
    )(rc, x)
    return out.reshape(NL, n)


@jax.jit
def _host_add(a, b):
    s = a + b
    lo = s & MASK
    hi = s >> LB
    return lo.at[1:].add(hi[:-1])  # top carry provably zero


def hash_many_pallas2(messages: list[list[int]]) -> list[int]:
    length = len(messages[0])
    n = len(messages)
    pad = (-n) % TILE
    arr = np.zeros((length, NL, n + pad), dtype=np.uint32)
    for j, msg in enumerate(messages):
        for i, w in enumerate(msg):
            arr[i, :, j] = PF.int_to_limbs15((w % P) * PF.R15 % P)
    out = np.asarray(hash_batch_pallas2(jnp.asarray(arr)))[:, :n]
    return [(v * PF.R15_INV) % P for v in PF.limbs15_to_ints(out)]

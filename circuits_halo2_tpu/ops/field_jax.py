"""Vectorized BN254 field arithmetic for TPU — 16-bit limbs in uint32 lanes.

Design (TPU-first, no 64-bit integer dependency):

- A field element is 16 little-endian 16-bit limbs stored in ``uint32``.
- Batch layout is **limbs-leading**: an array of shape ``(16, *batch)`` so the
  batch dimension rides the 128-wide VPU lanes and the (short, static) limb
  axis is unrolled / scanned.
- Multiplication is schoolbook column accumulation: 16×16 limb products are
  split into 16-bit halves before accumulating, so every intermediate fits a
  uint32 (max 32 summands × (2^16-1) < 2^21). A single carry `lax.scan` over
  the 32-column axis normalizes to exact limbs.
- Montgomery reduction is full-product REDC with R = 2^256:
  ``m = (T mod R)·N' mod R``, ``result = (T + m·N) / R``, one conditional
  subtract. Operands are kept in Montgomery form for mul-heavy code
  (Poseidon, NTT); ``to_mont``/``from_mont`` convert at the boundary.

This replaces the reference's halo2curves 4×64-bit Montgomery arithmetic
(`zk_prover` depends on halo2curves 0.1.0 — see SURVEY.md §2b) with a scheme
native to TPU's 32-bit integer VPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

NLIMBS = 16  # 16 × 16-bit = 256 bits
LIMB_BITS = 16
LIMB_MASK = 0xFFFF


# ---------------------------------------------------------------------------
# Host-side conversions
# ---------------------------------------------------------------------------

def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """One integer → (nlimbs,) uint32 LE 16-bit limbs."""
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(nlimbs)], dtype=np.uint32
    )


def ints_to_limbs(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """Sequence of ints → (nlimbs, len(xs)) uint32, limbs leading.

    Vectorized via a byte buffer: one ``to_bytes`` per element, then a
    16-bit little-endian view — ~50× the per-limb Python loop."""
    if len(xs) == 0:
        return np.empty((nlimbs, 0), dtype=np.uint32)
    buf = b"".join(int(x).to_bytes(nlimbs * 2, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), nlimbs)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(limbs[i]) << (LIMB_BITS * i) for i in range(limbs.shape[0]))


def limbs_to_ints(limbs) -> list[int]:
    """(nlimbs, N) of normalized (<2^16) limbs → list of N ints.

    Vectorized: pack to a little-endian u16 byte buffer, one
    ``int.from_bytes`` per element."""
    arr = np.ascontiguousarray(np.asarray(limbs).T.astype("<u2"))  # (N, nlimbs)
    if arr.shape[0] == 0:
        return []
    step = arr.shape[1] * 2
    buf = arr.tobytes()
    return [
        int.from_bytes(buf[i * step : (i + 1) * step], "little")
        for i in range(arr.shape[0])
    ]


class FieldSpec:
    """Static per-field constants, pre-limbed for device broadcast."""

    def __init__(self, mod: int, nprime: int, r2: int, r3: int | None = None):
        self.mod_int = mod
        self.mod = int_to_limbs(mod)
        self.nprime = int_to_limbs(nprime)
        self.r2 = int_to_limbs(r2 % mod)
        self.one_mont = int_to_limbs((1 << 256) % mod)
        self.zero = np.zeros(NLIMBS, dtype=np.uint32)

    def const(self, value: int, mont: bool = True) -> np.ndarray:
        """Embed a host integer as (16, 1) limbs, optionally in Montgomery form."""
        v = value % self.mod_int
        if mont:
            v = (v << 256) % self.mod_int
        return int_to_limbs(v).reshape((NLIMBS, 1))


FR = FieldSpec(F.FR_MOD, F.FR_NPRIME, F.FR_R2)
FQ = FieldSpec(F.FQ_MOD, F.FQ_NPRIME, F.FQ_R2)


def _bc(const: np.ndarray, ndim: int) -> jax.Array:
    """Reshape a (16,) per-field constant for broadcast against (16, *batch)."""
    return jnp.asarray(const).reshape((NLIMBS,) + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------

def _shift_down(x: jax.Array, d: int) -> jax.Array:
    """x[i-d] along axis 0, zero-filled below (carries flow low → high)."""
    return jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)


def _kogge_stone_carry(g: jax.Array, p: jax.Array) -> jax.Array:
    """Log-depth prefix carries. g, p: (C, *batch) 0/1 generate/propagate
    flags per column. Returns G where G[i] = carry OUT of column i (i.e.
    carry into column i+1), resolved in ceil(log2 C) shift-combine steps
    instead of a C-step sequential scan."""
    c = g.shape[0]
    d = 1
    while d < c:
        g = g | (p & _shift_down(g, d))
        p = p & _shift_down(p, d)
        d *= 2
    return g


def _carry_scan(cols: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Normalize per-column sums (< 2^27) to exact 16-bit limbs.

    cols: (C, *batch) uint32. Returns (limbs (C, *batch), carry_out (*batch,)).

    Log-depth (scan-free): two shift-and-add folds bound every column to
    [0, 2^16] (fold 1: lo<2^16 + hi<2^11; fold 2: lo<2^16 + hi≤1), leaving
    only 0/1 ripple carries, which a Kogge–Stone carry-lookahead resolves in
    log2(C) steps. The sequential ``lax.scan`` this replaces was the
    dominant cost of every exact field op on TPU (~C dependent micro-steps
    per mul; see the module docstring of ops/poseidon_fast for the history).
    """
    # two extra columns absorb the fold spill + final carry (spill < 2^12)
    x = jnp.concatenate([cols, jnp.zeros_like(cols[:2])], axis=0)
    for _ in range(2):
        x = (x & LIMB_MASK) + _shift_down(x >> LIMB_BITS, 1)
    g = x >> LIMB_BITS              # 0/1: column holds exactly 2^16
    p = ((x & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
    gg = _kogge_stone_carry(g, p)
    carry_in = _shift_down(gg, 1)
    limbs = (x + carry_in) & LIMB_MASK
    carry_out = limbs[-2] + (limbs[-1] << LIMB_BITS)
    return limbs[:-2], carry_out


def _sub_limbs(a: jax.Array, b) -> tuple[jax.Array, jax.Array]:
    """Exact limbwise a - b with log-depth borrow lookahead.

    Returns (diff, borrow_out). Borrow generate: a_i < b_i; propagate:
    a_i == b_i; same Kogge–Stone combine as the addition carries."""
    b = jnp.broadcast_to(jnp.asarray(b, jnp.uint32), a.shape)
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    bb = _kogge_stone_carry(g, p)
    borrow_in = _shift_down(bb, 1)
    diff = (a + (LIMB_MASK + 1) - b - borrow_in) & LIMB_MASK
    return diff, bb[-1]


def _cond_sub(spec_mod, x: jax.Array, carry_in=None) -> jax.Array:
    """If x (+ carry_in·2^256) >= mod, subtract mod once. Input < 2·mod."""
    diff, borrow = _sub_limbs(x, spec_mod)
    ge = borrow == 0
    if carry_in is not None:
        ge = ge | (carry_in > 0)  # an overflow limb makes the value >= 2^256 > mod
    return jnp.where(ge[None, ...], diff, x)


# ---------------------------------------------------------------------------
# Wide multiply
# ---------------------------------------------------------------------------
#
# Two formulations of the limb-product column sums, bit-identical outputs:
#
# "unrolled" — 16-step schoolbook accumulation (one vector multiply + two
#   scatter-adds per step). Fewest arithmetic ops and no large intermediates;
#   best steady-state throughput on the TPU VPU. But it traces to ~130 HLO
#   ops per multiply, and the prover/MSM scan bodies contain dozens of
#   multiplies — XLA compile time of those graphs (especially XLA:CPU) was
#   dominated by these unrolls.
#
# "dot" — both operands split into 8-bit half-limbs; ONE broadcast outer
#   product (32×32, products < 2^16) and ONE contraction with a constant 0/1
#   anti-diagonal matrix T (col8[k] = Σ_{i+j=k} a8[i]·b8[j], sums ≤ 32·2^16 <
#   2^21), then adjacent 8-bit columns pair-merged into 16-bit columns
#   (< 2^30, still uint32-safe; `_carry_scan` tolerates any uint32 input).
#   ~10x fewer HLO ops per multiply — compiles proportionally faster — at the
#   cost of materializing the (1024, batch) outer product, so per-element
#   HBM traffic is higher. On TPU the contraction rides the MXU.
#
# "scan" — the schoolbook j-loop as one lax.scan (body: one vector multiply
#   + a masked dynamic-roll accumulate). Same bounds and bit-exact results,
#   ~10x fewer traced ops than "unrolled", ~2x slower steady-state than it
#   (one extra memory pass per step); no large intermediates.
#
# Default: "scan" on CPU (compile time is the binding constraint there — the
# multichip dryrun and the test suite run on XLA:CPU, where the big prover
# graphs took minutes of LLVM per jit with the unrolled form), "unrolled" on
# TPU (runtime is). Override with CIRCUITS_TPU_MUL_IMPL=dot|scan|unrolled.

_T8_CACHE: dict[int, np.ndarray] = {}


def _antidiag_T8(out8: int) -> np.ndarray:
    """(out8, 1024) 0/1 matrix: row k sums flattened outer[i·32+j] over i+j=k."""
    if out8 not in _T8_CACHE:
        t = np.zeros((out8, 4 * NLIMBS * NLIMBS), dtype=np.uint32)
        for i in range(2 * NLIMBS):
            for j in range(2 * NLIMBS):
                if i + j < out8:
                    t[i + j, i * 2 * NLIMBS + j] = 1
        _T8_CACHE[out8] = t
    return _T8_CACHE[out8]


def _mul_columns_dot(a: jax.Array, b: jax.Array, out_limbs: int) -> jax.Array:
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (NLIMBS,) + batch)
    b = jnp.broadcast_to(b, (NLIMBS,) + batch)

    def split8(x):  # (16, *batch) → (32, *batch) interleaved lo/hi bytes
        return jnp.stack([x & 0xFF, x >> 8], axis=1).reshape(
            (2 * NLIMBS,) + batch
        )

    a8, b8 = split8(a), split8(b)
    outer = (a8[:, None] * b8[None, :]).reshape((4 * NLIMBS * NLIMBS,) + batch)
    out8 = 2 * out_limbs  # 8-bit columns covering the requested 16-bit ones
    cols8 = jax.lax.dot_general(
        jnp.asarray(_antidiag_T8(out8)),
        outer,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.uint32,
    )  # (out8, *batch), each < 2^21
    return cols8[0::2] + (cols8[1::2] << 8)  # (out_limbs, *batch) < 2^30


def _mul_columns_scan(a: jax.Array, b: jax.Array, out_limbs: int) -> jax.Array:
    """Schoolbook column sums with the 16-step j-loop as ONE lax.scan.

    Same arithmetic as the unrolled form (so same uint32 bounds, columns
    < 2^21) but ~10x fewer traced ops: the body is a single vector multiply
    plus a dynamic-roll accumulate. Compile-time optimized; steady-state it
    pays one extra memory pass per step for the roll."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (NLIMBS,) + batch)
    b = jnp.broadcast_to(b, (NLIMBS,) + batch)
    acc = jnp.zeros((out_limbs + 1,) + batch, dtype=jnp.uint32)
    # contribution of b[j]: (a·b_j) split into lo/hi staggered by one limb,
    # rolled up by j columns. Pad the stagger buffer to the acc length once.
    pad = out_limbs + 1 - (NLIMBS + 1)

    def step(acc, xs):
        j, b_j = xs
        p = a * b_j
        c = jnp.concatenate(
            [(p & LIMB_MASK), jnp.zeros_like(p[:1])], axis=0
        ) + jnp.concatenate([jnp.zeros_like(p[:1]), p >> LIMB_BITS], axis=0)
        if pad > 0:
            c = jnp.concatenate([c, jnp.zeros((pad,) + batch, jnp.uint32)], axis=0)
        elif pad < 0:
            c = c[: out_limbs + 1]
        # zero rows that would wrap around under the roll (truncated products,
        # out_limbs < 32): row r lands at r + j, so drop r >= out_limbs+1 - j.
        keep = jnp.arange(out_limbs + 1, dtype=jnp.int32) < (out_limbs + 1 - j)
        c = jnp.where(keep.reshape((out_limbs + 1,) + (1,) * len(batch)), c, 0)
        return acc + jnp.roll(c, j, axis=0), None

    acc, _ = jax.lax.scan(step, acc, (jnp.arange(NLIMBS, dtype=jnp.int32), b))
    return acc[:out_limbs]


def _mul_columns_unrolled(a: jax.Array, b: jax.Array, out_limbs: int) -> jax.Array:
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    acc = jnp.zeros((out_limbs + 1,) + batch, dtype=jnp.uint32)
    for j in range(NLIMBS):
        if j >= out_limbs:
            break
        width = min(NLIMBS, out_limbs - j)
        p = a[:width] * b[j]  # (width, *batch), exact (< 2^32)
        acc = acc.at[j : j + width].add(p & LIMB_MASK)
        acc = acc.at[j + 1 : j + width + 1].add(p >> LIMB_BITS)
    return acc[:out_limbs]


def _default_mul_impl() -> str:
    impl = os.environ.get("CIRCUITS_TPU_MUL_IMPL")
    if impl in ("dot", "scan", "unrolled"):
        return impl
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    return "scan" if backend == "cpu" else "unrolled"


_MUL_IMPL: str | None = None


def _mul_columns(a: jax.Array, b: jax.Array, out_limbs: int) -> jax.Array:
    """Column sums of the limb product, pre-carry.

    a, b: (16, *batch) exact 16-bit limbs. Returns (out_limbs, *batch) uint32
    columns (bounded < 2^30; `_carry_scan` normalizes any uint32 columns).
    """
    global _MUL_IMPL
    if _MUL_IMPL is None:
        _MUL_IMPL = _default_mul_impl()
    if _MUL_IMPL == "dot":
        return _mul_columns_dot(a, b, out_limbs)
    if _MUL_IMPL == "scan":
        return _mul_columns_scan(a, b, out_limbs)
    return _mul_columns_unrolled(a, b, out_limbs)


@functools.partial(jax.jit, static_argnums=(2,))
def mont_mul(a: jax.Array, b: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    """Montgomery product: returns a·b·R^{-1} mod p.  (16, *batch) layout."""
    ndim = max(a.ndim, b.ndim)
    mod = _bc(spec.mod, ndim)
    nprime = _bc(spec.nprime, ndim)
    # T = a * b (512-bit, exact limbs)
    t, _ = _carry_scan(_mul_columns(a, b, 2 * NLIMBS))
    # m = (T mod R) * N' mod R  (low half only)
    m, _ = _carry_scan(_mul_columns(t[:NLIMBS], nprime, NLIMBS))
    # T + m*N, take high half (low half is zero by construction)
    mn, _ = _carry_scan(_mul_columns(m, mod, 2 * NLIMBS))
    total, carry = _carry_scan(t + mn)  # columns <= 2·(2^16-1) < 2^17, safe
    hi = jnp.concatenate([total[NLIMBS:], carry[None]], axis=0)
    # hi < 2p and fits 17 limbs; top limb is 0 or tiny — fold into cond-sub
    hi16, top = hi[:NLIMBS], hi[NLIMBS]
    return _cond_sub(mod, hi16, carry_in=top)


def mont_sqr(a: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    return mont_mul(a, a, spec)


@functools.partial(jax.jit, static_argnums=(2,))
def add_mod(a: jax.Array, b: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    """(a + b) mod p for canonical inputs; works in either domain."""
    s, carry = _carry_scan(a + b)  # columns < 2^17
    return _cond_sub(_bc(spec.mod, s.ndim), s, carry_in=carry)


@functools.partial(jax.jit, static_argnums=(2,))
def sub_mod(a: jax.Array, b: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    """(a - b) mod p."""
    mod = _bc(spec.mod, max(a.ndim, b.ndim))
    s, carry = _carry_scan(a + jnp.broadcast_to(mod, jnp.broadcast_shapes(a.shape, b.shape)))
    diff, borrow = _sub_limbs(s, jnp.broadcast_to(b, s.shape))
    # a + p - b in [1, 2p); carry/borrow cancel: value = diff + (carry-borrow)·2^256
    return _cond_sub(mod, diff, carry_in=carry - borrow)


@functools.partial(jax.jit, static_argnums=(1,))
def neg_mod(a: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    mod = _bc(spec.mod, a.ndim)
    diff, _ = _sub_limbs(jnp.broadcast_to(mod, a.shape), a)
    # p - a, except a == 0 must map to 0 (p - 0 = p is non-canonical)
    is_zero = jnp.all(a == 0, axis=0)
    return jnp.where(is_zero[None, ...], jnp.zeros_like(a), diff)


@functools.partial(jax.jit, static_argnums=(1,))
def to_mont(a: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    return mont_mul(a, _bc(spec.r2, a.ndim), spec)


@functools.partial(jax.jit, static_argnums=(1,))
def from_mont(a: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one, spec)


@functools.partial(jax.jit, static_argnums=(1,))
def pow5(a: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    """x^5 in Montgomery form (the Poseidon S-box)."""
    a2 = mont_mul(a, a, spec)
    a4 = mont_mul(a2, a2, spec)
    return mont_mul(a4, a, spec)


@functools.partial(jax.jit, static_argnums=(1, 2))
def mont_pow(a: jax.Array, exponent: int, spec: FieldSpec = FR) -> jax.Array:
    """Fixed-exponent power — square-and-multiply via lax.scan over the bits
    (keeps the traced graph small: one square+select-multiply body)."""
    bits = np.array([int(b) for b in bin(exponent)[2:]], dtype=np.bool_)
    result = jnp.broadcast_to(_bc(spec.one_mont, a.ndim), a.shape).astype(jnp.uint32)

    def step(res, bit):
        res = mont_mul(res, res, spec)
        res = select(jnp.broadcast_to(bit, res.shape[1:]), mont_mul(res, a, spec), res)
        return res, None

    result, _ = jax.lax.scan(step, result, jnp.asarray(bits))
    return result


@functools.partial(jax.jit, static_argnums=(1,))
def inv_mont(a: jax.Array, spec: FieldSpec = FR) -> jax.Array:
    """Inverse via Fermat: a^(p-2). Zero maps to zero."""
    return mont_pow(a, spec.mod_int - 2, spec)


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=0)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=0)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise field select: mask ? a : b.  mask: (*batch,) bool."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# Convenience jitted wrappers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("field",))
def batch_mont_mul(a, b, field: str = "fr"):
    return mont_mul(a, b, FR if field == "fr" else FQ)


@functools.partial(jax.jit, static_argnames=("field",))
def batch_add_mod(a, b, field: str = "fr"):
    return add_mod(a, b, FR if field == "fr" else FQ)

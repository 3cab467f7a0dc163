"""Pallas fused segmented bucket-accumulation kernel for the MSM.

The Pippenger bucket stage's hot loop is a serial segmented scan of mixed
Jacobian+affine adds over digit-sorted points (`ops/msm.py
_segmented_sum_parts`). As an XLA `lax.scan`, every one of the L steps is
a separate fusion over HBM-resident (16, B·W·nchunk) tensors: ~11 field
muls round-trip HBM per step and the scan dominates MSM wall clock (~72k
pts/s in round 4 — ~25× off the VPU roofline).

This kernel runs the whole scan inside one pallas_call: the Jacobian
accumulator lives in VMEM scratch across grid steps, every limb is a
(8, 128) vreg-shaped block, and each grid step performs one fused
`jac_madd` over 1024 lanes with zero HBM traffic beyond streaming the
input points and the per-step local sums.

Field arithmetic: redundant 15-bit-limb Montgomery over **Fq** with
R = 2^255 (the scheme of ops/poseidon_fast, which runs Fr) plus the two
pieces Poseidon never needed — borrow-free subtraction and exact
canonicalization:

- SUB(a, b) = fold(a + (C24 − b)) where C24 is 24·q in a *saturated* limb
  decomposition (every limb ≥ 2^16 − 2, top limb 6): per-limb c_i − b_i
  never borrows for any in-envelope b (limbs ≤ 2^15+1, top limb ≤ 3).
- Envelope discipline (the round-4 device-tree bug was exactly an
  envelope violation, so the rules are explicit): mul/sqr keep one
  congruence fold (inputs < 6q ⇒ outputs < 6q); every add/dbl takes one
  extra congruence fold (< 12q → < 5.3q); every sub takes two
  (< 30q → < 4.7q). All values stay < 6q; top limbs stay ≤ 3.
- CANON(x): two congruence folds (< 2^256), exact limb propagation, and
  three conditional subtractions (4q, 2q, q) via 2^270-complement adds —
  outputs are canonical (< q) unique 15-bit limbs, so the XLA side can
  repack them into the exact 16-bit-limb field_jax format.

Domain bridging is one field mul per element on the XLA side:
R256-Montgomery → R15-Montgomery is multiplication by 1/2 (R15 = R256/2),
and back is multiplication by 2.

Replaces `best_multiexp`'s bucket accumulation (SURVEY §2b) on TPU.
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
from . import field_jax as FJ

Q = F.FQ_MOD
LB = 15
NL = 18            # 18 × 15 = 270 bits
LOW = 17           # R15 = 2^255
MASK = (1 << LB) - 1
R15 = 1 << (LB * LOW)

NP15_Q = (-pow(Q, -1, R15)) % R15
K15_Q = R15 % Q               # 2^255 mod q (congruence-fold constant)
R15_INV_Q = pow(R15, -1, Q)

SUB_LANE = 8
LANE = 128
TILE = SUB_LANE * LANE  # 1024 lanes per kernel instance


def _limbs_of(x: int, n: int) -> list[int]:
    return [(x >> (LB * i)) & ((1 << 32) - 1) & MASK for i in range(n)]


_NP15_L = _limbs_of(NP15_Q, LOW)
_Q15_L = _limbs_of(Q, LOW)
_K15_L = _limbs_of(K15_Q, LOW)

# C24: 24q with saturated limbs — c_0 = d_0 + 2^16, c_i = d_i + 2^16 − 2
# (1 ≤ i ≤ 16), c_17 = d_17 − 2. Value unchanged (each +2^16 at limb i is
# balanced by −2 at limb i+1); every limb dominates any in-envelope limb.
_D24 = [(24 * Q >> (LB * i)) & MASK for i in range(NL)]
_C24 = (
    [_D24[0] + (1 << 16)]
    + [_D24[i] + (1 << 16) - 2 for i in range(1, NL - 1)]
    + [_D24[NL - 1] - 2]
)
assert sum(c << (LB * i) for i, c in enumerate(_C24)) == 24 * Q
assert all(c >= (1 << 15) + 2 for c in _C24[:-1]) and _C24[-1] >= 4

# canonicalization: complements 2^270 − kq (19-limb constants; limb 18 is
# the 2^270 carry-out detector)
_CANON_KS = (4, 2, 1)
_COMPL = {
    k: [(((1 << 270) - k * Q) >> (LB * i)) & MASK for i in range(NL + 1)]
    for k in _CANON_KS
}


# ---------------------------------------------------------------------------
# Per-limb-list field ops (kernel-side; arrays are (8, 128) uint32 blocks)
# ---------------------------------------------------------------------------


def _fold(cols: list) -> list:
    lo = [c & MASK for c in cols]
    hi = [c >> LB for c in cols]
    out = [lo[0]]
    for i in range(1, len(cols)):
        out.append(lo[i] + hi[i - 1])
    out.append(hi[-1])
    return out


def _cong(x: list) -> list:
    """One congruence fold: value = low255 + top·2^255 ≡ low + top·K."""
    out = [x[i] + x[LOW] * _K15_L[i] if _K15_L[i] else x[i] for i in range(LOW)]
    return _fold(out)[:NL]


def _mul_dyn(a: list, b: list) -> list:
    """Schoolbook column products with grouped lo/hi accumulation
    (limbs ≤ 2^15+1 ⇒ 3 products per uint32 group)."""
    zero = jnp.zeros_like(a[0])
    out_limbs = len(a) + len(b)
    acc = [zero] * (out_limbs + 1)
    group: list = [None] * (out_limbs + 1)
    gw = [0] * (out_limbs + 1)
    for j, bj in enumerate(b):
        for i, ai in enumerate(a):
            k = i + j
            p = ai * bj
            if group[k] is not None and gw[k] + 1 > 3:
                acc[k] = acc[k] + (group[k] & MASK)
                acc[k + 1] = acc[k + 1] + (group[k] >> LB)
                group[k], gw[k] = None, 0
            group[k] = p if group[k] is None else group[k] + p
            gw[k] += 1
    for k in range(out_limbs + 1):
        if group[k] is not None:
            acc[k] = acc[k] + (group[k] & MASK)
            if k + 1 <= out_limbs:
                acc[k + 1] = acc[k + 1] + (group[k] >> LB)
    return acc[:out_limbs]


def _mul_const(a: list, b: list[int], out_limbs: int) -> list:
    zero = jnp.zeros_like(a[0])
    acc = [zero] * (out_limbs + 1)
    group: list = [None] * (out_limbs + 1)
    gw = [0] * (out_limbs + 1)
    for j, bj in enumerate(b):
        if bj == 0:
            continue
        for i, ai in enumerate(a):
            k = i + j
            if k >= out_limbs:
                break
            p = ai * bj
            if group[k] is not None and gw[k] + 1 > 3:
                acc[k] = acc[k] + (group[k] & MASK)
                acc[k + 1] = acc[k + 1] + (group[k] >> LB)
                group[k], gw[k] = None, 0
            group[k] = p if group[k] is None else group[k] + p
            gw[k] += 1
    for k in range(out_limbs + 1):
        if group[k] is not None:
            acc[k] = acc[k] + (group[k] & MASK)
            if k + 1 <= out_limbs:
                acc[k + 1] = acc[k + 1] + (group[k] >> LB)
    return acc[:out_limbs]


def _redc(t: list) -> list:
    """REDC with the low-columns 0-or-R carry trick + one congruence fold.
    Inputs (column form, 2·NL wide); output < 6q for operand values < 6q."""
    m = _fold(_mul_const(t[:LOW], _NP15_L, LOW))[:LOW]
    mn = _mul_const(m, _Q15_L, 2 * NL)
    s = [a + b for a, b in zip(t[: 2 * NL], mn)]
    s = _fold(_fold(s))
    nz = s[0]
    for c in s[1:LOW]:
        nz = nz | c
    carry = (nz != 0).astype(jnp.uint32)
    out = [s[LOW] + carry] + s[LOW + 1 : LOW + NL]
    return _cong(out)


def _mm(a: list, b: list) -> list:
    return _redc(_fold(_mul_dyn(a, b)))


def _sq(a: list) -> list:
    return _redc(_fold(_mul_dyn(a, a)))


def _add(a: list, b: list) -> list:
    """a + b with one fold and one congruence fold (envelope < 5.3q)."""
    return _cong(_fold([x + y for x, y in zip(a, b)])[:NL])


def _dbl(a: list) -> list:
    return _cong(_fold([x + x for x in a])[:NL])


def _sub(a: list, b: list) -> list:
    """a − b via the saturated 24q complement; two congruence folds."""
    s = [a[i] + _C24[i] - b[i] for i in range(NL)]
    return _cong(_cong(_fold(s)[:NL]))


def _propagate(x: list) -> list:
    """Exact ripple carry to unique 15-bit limbs (+1 spill limb)."""
    out = []
    carry = None
    for i in range(len(x)):
        v = x[i] if carry is None else x[i] + carry
        out.append(v & MASK)
        carry = v >> LB
    out.append(carry)
    return out


def _canon(x: list) -> list:
    """Exact canonical form (< q, unique limbs). Input < 6q."""
    # two congruence folds → < 4.7q < 2^256, then exact propagation
    y = _propagate(_cong(_cong(x)))[:NL]
    # conditional subtract kq via 2^270-complement add: carry-out at limb 18
    for k in _CANON_KS:
        comp = _COMPL[k]
        s = _propagate([y[i] + comp[i] for i in range(NL)] + [comp[NL]])
        ge = (s[NL] > 0).astype(jnp.uint32)  # bit 270 set ⟺ y ≥ kq
        y = [ge * s[i] + (1 - ge) * y[i] for i in range(NL)]
    return y


def _is_zero_modq(x: list) -> jax.Array:
    """x ≡ 0 (mod q) for in-envelope x (< 6q): canonicalize-free test —
    propagate exactly and compare against 0, q, …, 5q limb patterns."""
    y = _propagate(x)[: NL + 1]
    acc = None
    for k in range(6):
        pat = [((k * Q) >> (LB * i)) & MASK for i in range(NL + 1)]
        m = (y[0] == pat[0]).astype(jnp.uint32)
        for i in range(1, NL + 1):
            m = m & (y[i] == pat[i]).astype(jnp.uint32)
        acc = m if acc is None else acc | m
    return acc


def _sel(mask, a: list, b: list) -> list:
    """mask ∈ {0,1} u32: mask ? a : b, limbwise."""
    return [mask * x + (1 - mask) * y for x, y in zip(a, b)]


# ---------------------------------------------------------------------------
# Jacobian ops (per-limb lists; Z = 0 encodes infinity, exact zeros)
# ---------------------------------------------------------------------------

_ONE15 = _limbs_of((1 * R15) % Q, NL)  # Montgomery one


def _const_list(vals: list[int], like) -> list:
    return [jnp.full_like(like, v) for v in vals]


def _jac_double(p):
    x1, y1, z1 = p
    a = _sq(x1)
    b = _sq(y1)
    c = _sq(b)
    d_in = _add(x1, b)
    d = _sub(_sq(d_in), _add(a, c))
    d = _dbl(d)
    e = _add(_dbl(a), a)
    f = _sq(e)
    x3 = _sub(f, _dbl(d))
    c8 = _dbl(_dbl(_dbl(c)))
    y3 = _sub(_mm(e, _sub(d, x3)), c8)
    z3 = _dbl(_mm(y1, z1))
    return (x3, y3, z3)


def _jac_madd(p, q_pt):
    """p (Jacobian) + q (affine (x2, y2), valid mask) — mirrors
    ops/msm.py `jac_madd` semantics exactly."""
    x1, y1, z1 = p
    x2, y2, valid = q_pt
    z1z1 = _sq(z1)
    u2 = _mm(x2, z1z1)
    s2 = _mm(_mm(y2, z1), z1z1)
    h = _sub(u2, x1)
    hh = _sq(h)
    i = _dbl(_dbl(hh))
    j = _mm(h, i)
    rr = _dbl(_sub(s2, y1))
    v = _mm(x1, i)
    x3 = _sub(_sub(_sq(rr), j), _dbl(v))
    y3 = _sub(_mm(rr, _sub(v, x3)), _dbl(_mm(y1, j)))
    z1h = _add(z1, h)
    z3 = _sub(_sub(_sq(z1h), z1z1), hh)

    zero_like = jnp.zeros_like(x1[0])
    p_inf = _raw_zero(z1)
    q_inf = (1 - valid).astype(jnp.uint32)
    h_zero = _is_zero_modq(h)
    r_zero = _is_zero_modq(rr)
    dbl = _jac_double(p)
    one = _const_list(_ONE15, zero_like)
    zero3 = [zero_like] * NL

    live = (1 - p_inf) * (1 - q_inf)
    use_dbl = h_zero * r_zero * live
    to_inf = h_zero * (1 - r_zero) * live
    x3 = _sel(use_dbl, dbl[0], x3)
    y3 = _sel(use_dbl, dbl[1], y3)
    z3 = _sel(use_dbl, dbl[2], z3)
    z3 = _sel(to_inf, zero3, z3)
    x3 = _sel(p_inf, x2, x3)
    y3 = _sel(p_inf, y2, y3)
    z3 = _sel(p_inf, one, z3)
    x3 = _sel(q_inf, x1, x3)
    y3 = _sel(q_inf, y1, y3)
    z3 = _sel(q_inf, z1, z3)
    return (x3, y3, z3)


def _raw_zero(x: list) -> jax.Array:
    """All-limbs-zero test (infinity z is always SET as exact zeros)."""
    nz = x[0]
    for c in x[1:]:
        nz = nz | c
    return (nz == 0).astype(jnp.uint32)


# in-kernel domain conversions (keeps the XLA side transpose-only):
#   in : V = a·R256 canonical 16-limb → repack → ·C_IN/R15 = a·R15
#   out: w = s·R15 fat → ·C_OUT/R15 = s·R256 → canon → repack
_C_IN = _limbs_of((1 << 254) % Q, NL)
_C_OUT = _limbs_of((1 << 256) % Q, NL)


def _repack16_15(x16: list) -> list:
    """16 × 16-bit exact limbs → 18 × 15-bit exact limbs (bit shuffle)."""
    out = []
    for i in range(NL):
        lo_bit = LB * i
        w, ofs = divmod(lo_bit, 16)
        if w >= 16:
            out.append(jnp.zeros_like(x16[0]))
            continue
        v = x16[w] >> ofs
        if ofs > 16 - LB and w + 1 < 16:
            v = v | (x16[w + 1] << (16 - ofs))
        out.append(v & MASK)
    return out


def _repack15_16(x15: list) -> list:
    """18 × 15-bit exact limbs → 16 × 16-bit exact limbs."""
    out = []
    for j in range(16):
        lo_bit = 16 * j
        i, ofs = divmod(lo_bit, LB)
        v = x15[i] >> ofs
        used = LB - ofs
        while used < 16 and i + 1 < NL:
            i += 1
            v = v | (x15[i] << used)
            used += LB
        out.append(v & 0xFFFF)
    return out


def _mm_const(a: list, c: list[int]) -> list:
    return _redc(_fold(_mul_const(a, c, 2 * NL)))


def _load_point(x16: list) -> list:
    return _mm_const(_repack16_15(x16), _C_IN)


def _emit_point(w15: list) -> list:
    return _repack15_16(_canon(_mm_const(w15, _C_OUT)))


# ---------------------------------------------------------------------------
# The scan kernel
# ---------------------------------------------------------------------------


def _scan_kern(seg_ref, xs_ref, ys_ref, vs_ref,
               ox_ref, oy_ref, oz_ref, acc_ref):
    """Grid (tiles, L); t = program_id(1) varies fastest, so the VMEM
    scratch accumulator persists across the L serial steps of each tile.
    acc layout: 3·NL Jacobian limb planes + 1 previous-segment plane."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        acc_ref[3 * NL] = jnp.full((SUB_LANE, LANE), 0x7FFFFFFF, jnp.uint32)

    seg = seg_ref[0, 0].astype(jnp.uint32)      # (8, 128)
    valid = vs_ref[0, 0].astype(jnp.uint32)
    # inputs arrive as exact 16-limb R256-Montgomery; convert in-kernel
    # (one constant mul per coordinate — cheap next to the madd's 11)
    ex = _load_point([xs_ref[0, 0, l] for l in range(16)])
    ey = _load_point([ys_ref[0, 0, l] for l in range(16)])

    cx = [acc_ref[l] for l in range(NL)]
    cy = [acc_ref[NL + l] for l in range(NL)]
    cz = [acc_ref[2 * NL + l] for l in range(NL)]
    cseg = acc_ref[3 * NL]

    # new segment ⇒ restart the accumulator at infinity
    same = (seg == cseg).astype(jnp.uint32)
    cz = _sel(same, cz, [jnp.zeros_like(cz[0])] * NL)

    nx, ny, nz = _jac_madd((cx, cy, cz), (ex, ey, valid))

    for l in range(NL):
        acc_ref[l] = nx[l]
        acc_ref[NL + l] = ny[l]
        acc_ref[2 * NL + l] = nz[l]
    acc_ref[3 * NL] = seg

    gx = _emit_point(nx)
    gy = _emit_point(ny)
    gz = _emit_point(nz)
    for l in range(16):
        ox_ref[0, 0, l] = gx[l]
        oy_ref[0, 0, l] = gy[l]
        oz_ref[0, 0, l] = gz[l]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_pallas(seg, xs, ys, vs, interpret: bool = False):
    """seg, vs: (L, ntile, 8, 128) uint32;
    xs, ys: (L, ntile, 16, 8, 128) uint32 — exact 16-limb R256-Montgomery.
    Returns 3 × (L, ntile, 16, 8, 128) canonical 16-limb local sums
    (domain/format conversions happen in-kernel)."""
    L, ntile = seg.shape[0], seg.shape[1]
    grid = (ntile, L)
    pt_spec = pl.BlockSpec(
        (1, 1, 16, SUB_LANE, LANE), lambda i, t: (t, i, 0, 0, 0)
    )
    sc_spec = pl.BlockSpec((1, 1, SUB_LANE, LANE), lambda i, t: (t, i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((L, ntile, 16, SUB_LANE, LANE), jnp.uint32)

    return pl.pallas_call(
        _scan_kern,
        grid=grid,
        in_specs=[sc_spec, pt_spec, pt_spec, sc_spec],
        out_specs=[pt_spec, pt_spec, pt_spec],
        out_shape=[out_shape, out_shape, out_shape],
        scratch_shapes=[pltpu.VMEM((3 * NL + 1, SUB_LANE, LANE), jnp.uint32)],
        interpret=interpret,
    )(seg, xs, ys, vs)


# ---------------------------------------------------------------------------
# XLA-side format bridging (16×16-bit ↔ 18×15-bit limbs)
# ---------------------------------------------------------------------------

_INV2_CONV = FJ.int_to_limbs((pow(2, -1, Q) << 256) % Q)   # R256→R15 domain
_TWO_CONV = FJ.int_to_limbs((2 << 256) % Q)                # R15→R256 domain


def repack_16_to_15(x: jax.Array) -> jax.Array:
    """(16, *b) exact 16-bit limbs → (18, *b) exact 15-bit limbs."""
    outs = []
    for i in range(NL):
        lo_bit = LB * i
        w, ofs = divmod(lo_bit, 16)
        if w >= 16:
            outs.append(jnp.zeros_like(x[0]))
            continue
        v = x[w] >> ofs
        if ofs > 16 - LB and w + 1 < 16:
            v = v | (x[w + 1] << (16 - ofs))
        outs.append(v & MASK)
    return jnp.stack(outs)


def repack_15_to_16(x: jax.Array) -> jax.Array:
    """(18, *b) exact 15-bit limbs → (16, *b) exact 16-bit limbs."""
    outs = []
    for j in range(16):
        lo_bit = 16 * j
        i, ofs = divmod(lo_bit, LB)
        v = x[i] >> ofs
        used = LB - ofs
        while used < 16 and i + 1 < NL:
            i += 1
            v = v | (x[i] << used)
            used += LB
        outs.append(v & 0xFFFF)
    return jnp.stack(outs)


def to_kernel_form(a16: jax.Array) -> jax.Array:
    """R256-Montgomery 16-limb → R15-Montgomery 15-limb (canonical)."""
    shifted = FJ.mont_mul(a16, FJ._bc(jnp.asarray(_INV2_CONV), a16.ndim), FJ.FQ)
    return repack_16_to_15(shifted)


def from_kernel_form(a15: jax.Array) -> jax.Array:
    """Canonical 15-limb R15-Montgomery → 16-limb R256-Montgomery."""
    a16 = repack_15_to_16(a15)
    return FJ.mont_mul(a16, FJ._bc(jnp.asarray(_TWO_CONV), a16.ndim), FJ.FQ)

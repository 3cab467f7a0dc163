"""Multi-scalar multiplication on device — batched Jacobian EC arithmetic.

Replaces ``halo2_proofs::arithmetic::best_multiexp`` (Pippenger on rayon
threads; SURVEY.md §2b). Round-1 device algorithm is a vectorized bit-slice
double-and-add:

    acc = 0
    for bit b from MSB to LSB:
        acc = 2·acc + Σ_i { P_i : scalar_i has bit b }

The inner Σ is a log-depth pairwise tree of Jacobian adds over the full
lane-width — every step is a wide VPU op, there is no data-dependent control
flow, and the scan over bits keeps the compiled graph small. (The Pippenger
bucket variant with sorted segments + sharded windows is the planned
upgrade; the MSM API here is the stable seam.)

Points: Jacobian (X, Y, Z) over Fq, each coordinate a (16, N) Montgomery
limb tensor; Z = 0 encodes infinity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from . import field_jax as FJ

FQ = FJ.FQ

SCALAR_BITS = 254


def _mm(a, b):
    return FJ.mont_mul(a, b, FQ)


def _add(a, b):
    return FJ.add_mod(a, b, FQ)


def _sub(a, b):
    return FJ.sub_mod(a, b, FQ)


def _dbl_f(a):  # 2a
    return FJ.add_mod(a, a, FQ)


def jac_double(p):
    """Jacobian doubling, a=0 curve (dbl-2009-l). Handles infinity via Z=0."""
    x, y, z = p
    a = _mm(x, x)
    b = _mm(y, y)
    c = _mm(b, b)
    xb = _add(x, b)
    d = _sub(_sub(_mm(xb, xb), a), c)
    d = _dbl_f(d)
    e = _add(_add(a, a), a)
    f = _mm(e, e)
    x3 = _sub(f, _dbl_f(d))
    c8 = _dbl_f(_dbl_f(_dbl_f(c)))
    y3 = _sub(_mm(e, _sub(d, x3)), c8)
    z3 = _dbl_f(_mm(y, z))
    # doubling of infinity (z=0) yields z3=0 automatically; y=0 → z3=0 too.
    return (x3, y3, z3)


def jac_add(p, q):
    """Complete Jacobian addition (add-2007-bl) with case handling."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = _mm(z1, z1)
    z2z2 = _mm(z2, z2)
    u1 = _mm(x1, z2z2)
    u2 = _mm(x2, z1z1)
    s1 = _mm(_mm(y1, z2), z2z2)
    s2 = _mm(_mm(y2, z1), z1z1)
    h = _sub(u2, u1)
    rr = _dbl_f(_sub(s2, s1))
    i = _mm(_dbl_f(h), _dbl_f(h))
    j = _mm(h, i)
    v = _mm(u1, i)
    x3 = _sub(_sub(_mm(rr, rr), j), _dbl_f(v))
    y3 = _sub(_mm(rr, _sub(v, x3)), _dbl_f(_mm(s1, j)))
    z1z2 = _mm(z1, z2)
    z3 = _dbl_f(_mm(z1z2, h))

    p_inf = FJ.is_zero(z1)
    q_inf = FJ.is_zero(z2)
    h_zero = FJ.is_zero(h)
    r_zero = FJ.is_zero(rr)
    dbl = jac_double(p)

    sel = FJ.select
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    # h==0, r!=0 → P + (-P) = infinity
    to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf
    x3 = sel(use_dbl, dbl[0], x3)
    y3 = sel(use_dbl, dbl[1], y3)
    z3 = sel(use_dbl, dbl[2], z3)
    z3 = sel(to_inf, jnp.zeros_like(z3), z3)
    x3 = sel(p_inf, x2, sel(q_inf, x1, x3))
    y3 = sel(p_inf, y2, sel(q_inf, y1, y3))
    z3 = sel(p_inf, z2, sel(q_inf, z1, z3))
    return (x3, y3, z3)


def _tree_sum(p, n: int):
    """Pairwise-tree sum of n (power-of-two) lane points → width-1 point."""
    x, y, z = p
    while n > 1:
        half = n // 2
        a = (x[:, :half], y[:, :half], z[:, :half])
        b = (x[:, half:n], y[:, half:n], z[:, half:n])
        x, y, z = jac_add(a, b)
        n = half
    return (x, y, z)


@functools.partial(jax.jit, static_argnames=("n",))
def _msm_device(xs, ys, bits, n: int):
    """xs, ys: (16, n) affine Montgomery Fq coords; bits: (SCALAR_BITS, n)
    uint32 scalar bits, MSB first. Returns width-1 Jacobian point."""
    one = jnp.broadcast_to(FJ._bc(FQ.one_mont, 2), (16, n)).astype(jnp.uint32)

    def step(acc, bit_row):
        acc = jac_double(acc)
        # select P_i when bit set: use Z = bit (0 → infinity)
        z = jnp.where(bit_row[None, :] > 0, one, jnp.zeros_like(one))
        contrib = _tree_sum((xs, ys, z), n)
        return jac_add(acc, contrib), None

    zero = (
        jnp.zeros((16, 1), jnp.uint32),
        jnp.zeros((16, 1), jnp.uint32),
        jnp.zeros((16, 1), jnp.uint32),
    )
    acc, _ = jax.lax.scan(step, zero, bits)
    return acc


def _points_to_device(points) -> tuple[np.ndarray, np.ndarray]:
    """Affine host points → Montgomery coord arrays; infinity → (0, 0)."""
    xs = [(p[0] << 256) % F.FQ_MOD if p is not None else 0 for p in points]
    ys = [(p[1] << 256) % F.FQ_MOD if p is not None else 0 for p in points]
    return FJ.ints_to_limbs(xs), FJ.ints_to_limbs(ys)


def _scalars_to_bits(scalars, n: int) -> np.ndarray:
    """Host scalars → (SCALAR_BITS, n) uint32, MSB first. Infinity/zero-pad
    lanes get zero scalars."""
    out = np.zeros((SCALAR_BITS, n), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s %= F.FR_MOD
        for b in range(SCALAR_BITS):
            out[SCALAR_BITS - 1 - b, i] = (s >> b) & 1
    return out


def jac_to_affine_host(p):
    """Width-1 device Jacobian point → host affine tuple (or None)."""
    rinv = pow(1 << 256, -1, F.FQ_MOD)
    x = FJ.limbs_to_ints(np.asarray(p[0]))[0] * rinv % F.FQ_MOD
    y = FJ.limbs_to_ints(np.asarray(p[1]))[0] * rinv % F.FQ_MOD
    z = FJ.limbs_to_ints(np.asarray(p[2]))[0] * rinv % F.FQ_MOD
    if z == 0:
        return None
    zinv = pow(z, -1, F.FQ_MOD)
    zi2 = zinv * zinv % F.FQ_MOD
    return (x * zi2 % F.FQ_MOD, y * zi2 % F.FQ_MOD * zinv % F.FQ_MOD)


# Fixed device lane width: every MSM dispatch compiles once. Large MSMs are
# chunked; chunk partials are combined host-side (a handful of adds).
CHUNK = 2048
# Below this size the host naive MSM is faster than a device dispatch.
HOST_THRESHOLD = 256


def msm(points, scalars):
    """MSM of host affine points with host int scalars → host affine point."""
    assert len(points) == len(scalars)
    # explicit infinity points must not be resurrected by Z=bit — zero their
    # scalars so their bits never select them.
    scalars = [0 if p is None else s for p, s in zip(points, scalars)]
    if len(points) < HOST_THRESHOLD:
        return C.g1_msm(points, scalars)
    acc = None
    for ofs in range(0, len(points), CHUNK):
        pts = points[ofs : ofs + CHUNK]
        scs = scalars[ofs : ofs + CHUNK]
        if len(pts) < CHUNK:
            pts = pts + [None] * (CHUNK - len(pts))
            scs = scs + [0] * (CHUNK - len(scs))
        xs, ys = _points_to_device(pts)
        bits = _scalars_to_bits(scs, CHUNK)
        part = jac_to_affine_host(
            _msm_device(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bits), CHUNK)
        )
        acc = C.g1_add(acc, part)
    return acc

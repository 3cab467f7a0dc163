"""Elliptic-curve FFT over G1 — Lagrange-basis derivation for ``downsize``.

halo2's ``ParamsKZG::downsize`` truncates the monomial SRS and re-derives
Lagrange commitments via an FFT over group elements (butterflies combine a
point-add with a scalar multiplication by the twiddle;
``halo2_proofs::arithmetic::best_fft`` over G1 — SURVEY.md §2b). Two paths:

- host (``ec_fft``): Python Jacobian math, fine for n ≤ 2^12;
- device (``ec_fft_device``): the butterflies run vectorized over
  (16, n) Jacobian limb tensors on the TPU — each stage is one gather +
  a 254-step double-and-add scalar-mul scan (per-lane twiddle scalars) +
  two complete Jacobian adds. This is what makes ``downsize`` from a
  k≥13 SRS tractable (the host path at k=13 is ~10^8 Python group ops).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import field as F
from ..ops import field_jax as FJ
from ..ops import msm as M
from ..ops import ntt as NTT


def _bit_reverse(points: list) -> list:
    n = len(points)
    rev = NTT.bit_reverse_indices(n)
    return [points[rev[i]] for i in range(n)]


def ec_fft(points: list, omega: int) -> list:
    """DFT over G1: out[i] = Σ_j omega^{ij} · P_j (Jacobian host math)."""
    n = len(points)
    assert n & (n - 1) == 0
    jac = _bit_reverse(
        [None if p is None else (p[0], p[1], 1) for p in points]
    )
    logn = n.bit_length() - 1
    for s in range(logn):
        half = 1 << s
        step = F.fr_pow(omega, n >> (s + 1))
        for start in range(0, n, 2 * half):
            w = 1
            for j in range(half):
                u = jac[start + j]
                v = _jac_scalar_mul(jac[start + half + j], w)
                jac[start + j] = C._jac_add(u, v)
                jac[start + half + j] = C._jac_add(u, _jac_neg(v))
                w = w * step % F.FR_MOD
    return [C._jac_to_affine(p) for p in jac]


def _jac_neg(p):
    if p is None:
        return None
    return (p[0], (-p[1]) % C.Q, p[2])


def _jac_scalar_mul(p, k: int):
    k %= F.FR_MOD
    if p is None or k == 0:
        return None
    result = None
    addend = p
    while k:
        if k & 1:
            result = C._jac_add(result, addend)
        addend = C._jac_double(addend)
        k >>= 1
    return result


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------

# Below this size a device dispatch (plus its one-off compile) costs more
# than the host loop; above it the host loop's Python group ops dominate.
DEVICE_MIN = int(os.environ.get("CIRCUITS_ECFFT_DEVICE_MIN", 1 << 8))

_scalar_tw_cache: dict[tuple[int, int], np.ndarray] = {}

# bit schedule for the 254-bit double-and-add: (limb index, shift) pairs
_BITS = 254
_BIT_LIMB = np.arange(_BITS, dtype=np.int32) // FJ.LIMB_BITS
_BIT_SHIFT = (np.arange(_BITS, dtype=np.int32) % FJ.LIMB_BITS).astype(np.uint32)


def _scalar_twiddles(n: int, omega: int) -> np.ndarray:
    """Per-stage twiddle SCALARS (plain ints, not field-Montgomery) tiled to
    full butterfly width: (logn, 16, n/2) uint32 limbs of ω_s^j."""
    key = (n, omega)
    hit = _scalar_tw_cache.get(key)
    if hit is not None:
        return hit
    logn = n.bit_length() - 1
    half_n = n // 2
    tw = np.empty((logn, FJ.NLIMBS, half_n), dtype=np.uint32)
    for s in range(logn):
        half = 1 << s
        step = F.fr_pow(omega, n >> (s + 1))
        ws = [1] * half
        for t_ in range(1, half):
            ws[t_] = ws[t_ - 1] * step % F.FR_MOD
        limbs = FJ.ints_to_limbs(ws)  # (16, half), plain
        tw[s] = np.tile(limbs, (1, half_n // half))[:, :half_n]
    _scalar_tw_cache[key] = tw
    return tw


def _scalar_mul_vec(p, k):
    """Per-lane scalar mul: p = (X, Y, Z) (16, m) Jacobian Montgomery-Fq
    tensors, k (16, m) plain uint32 scalar limbs. LSB-first double-and-add
    as one 254-step scan (one complete add + one double per bit)."""
    zero = tuple(jnp.zeros_like(c) for c in p)

    def bit_step(carry, ls):
        l, sft = ls
        res, add = carry
        limb = jax.lax.dynamic_index_in_dim(k, l, axis=0, keepdims=False)
        bit = ((limb >> sft) & 1) != 0  # (m,)
        summed = M.jac_add(res, add)
        res = tuple(FJ.select(bit, s, r) for s, r in zip(summed, res))
        add = M.jac_double(add)
        return (res, add), None

    (res, _), _ = jax.lax.scan(
        bit_step, (zero, p), (jnp.asarray(_BIT_LIMB), jnp.asarray(_BIT_SHIFT))
    )
    return res


@jax.jit
def _ec_fft_core(x, y, z, uidx, vidx, perm, tw, scale):
    """Bit-reversed input (16, n) Jacobian tensors → DFT, then a constant
    ``scale`` scalar-mul (pass scale = limbs of 1 for the forward DFT)."""

    def stage(carry, tabs):
        ui, vi, pm, tws = tabs
        u = tuple(jnp.take(c, ui, axis=-1) for c in carry)
        pv = tuple(jnp.take(c, vi, axis=-1) for c in carry)
        v = _scalar_mul_vec(pv, tws)
        vneg = (v[0], FJ.neg_mod(v[1], FJ.FQ), v[2])
        top = M.jac_add(u, v)
        bot = M.jac_add(u, vneg)
        out = tuple(
            jnp.take(jnp.concatenate([t, b], axis=-1), pm, axis=-1)
            for t, b in zip(top, bot)
        )
        return out, None

    state, _ = jax.lax.scan(stage, (x, y, z), (uidx, vidx, perm, tw))
    n = x.shape[-1]
    return _scalar_mul_vec(state, jnp.broadcast_to(scale, (FJ.NLIMBS, n)))


def _jac_tensors_to_affine(x, y, z) -> list:
    """Device Jacobian tensors → host affine list (None = infinity)."""
    rinv = pow(1 << 256, -1, F.FQ_MOD)
    xi = [v * rinv % F.FQ_MOD for v in FJ.limbs_to_ints(np.asarray(x))]
    yi = [v * rinv % F.FQ_MOD for v in FJ.limbs_to_ints(np.asarray(y))]
    zi = [v * rinv % F.FQ_MOD for v in FJ.limbs_to_ints(np.asarray(z))]
    zinv = F.batch_inv(zi, F.FQ_MOD)
    out = []
    for xv, yv, zv in zip(xi, yi, zinv):
        if zv == 0:
            out.append(None)
            continue
        z2 = zv * zv % F.FQ_MOD
        out.append((xv * z2 % F.FQ_MOD, yv * z2 % F.FQ_MOD * zv % F.FQ_MOD))
    return out


def ec_fft_device(points: list, omega: int, scale: int = 1) -> list:
    """Device-vectorized ``ec_fft`` (optionally scaled by a constant): the
    whole transform is one jitted scan over stages on (16, n) limb tensors."""
    n = len(points)
    assert n & (n - 1) == 0 and n >= 2
    xs, ys = M._points_to_device(points)
    valid = np.array([p is not None for p in points])
    one = FJ.FQ.one_mont.reshape(FJ.NLIMBS, 1)
    zs = np.where(valid[None, :], one, 0).astype(np.uint32)
    rev = NTT._bitrev(n)
    uidx, vidx, perm, _ = NTT._scan_tables(n, omega)
    tw = _scalar_twiddles(n, omega)
    sc = FJ.int_to_limbs(scale % F.FR_MOD).reshape(FJ.NLIMBS, 1)
    x, y, z = _ec_fft_core(
        jnp.asarray(xs[:, rev]),
        jnp.asarray(ys[:, rev]),
        jnp.asarray(zs[:, rev]),
        jnp.asarray(uidx),
        jnp.asarray(vidx),
        jnp.asarray(perm),
        jnp.asarray(tw),
        jnp.asarray(sc),
    )
    return _jac_tensors_to_affine(x, y, z)


def g_to_lagrange(g_monomial: list, k: int) -> list:
    """[s^i]G for i < 2^k  →  [L_i(s)]G (inverse EC-FFT with n^-1 scale)."""
    n = 1 << k
    assert len(g_monomial) == n
    omega_inv = F.fr_inv(NTT.omega_for_k(k))
    n_inv = F.fr_inv(n)
    if n >= DEVICE_MIN:
        return ec_fft_device(g_monomial, omega_inv, scale=n_inv)
    transformed = ec_fft(g_monomial, omega_inv)
    return [
        None if p is None else C._jac_to_affine(
            _jac_scalar_mul((p[0], p[1], 1), n_inv)
        )
        for p in transformed
    ]

"""Elliptic-curve FFT over G1 — Lagrange-basis derivation for ``downsize``.

halo2's ``ParamsKZG::downsize`` truncates the monomial SRS and re-derives
Lagrange commitments via an FFT over group elements (butterflies combine a
point-add with a scalar multiplication by the twiddle). This host
implementation covers the moderate sizes the pipeline downsizes through
(k ≤ 12 in practice — hermez files ship per-k); the device-vectorized
variant over Jacobian limb tensors is queued (PROGRESS.md).
"""

from __future__ import annotations

from ..ops import curve as C
from ..ops import field as F
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


def g_to_lagrange(g_monomial: list, k: int) -> list:
    """[s^i]G for i < 2^k  →  [L_i(s)]G (inverse EC-FFT with n^-1 scale)."""
    n = 1 << k
    assert len(g_monomial) == n
    omega_inv = F.fr_inv(NTT.omega_for_k(k))
    n_inv = F.fr_inv(n)
    transformed = ec_fft(g_monomial, omega_inv)
    return [
        None if p is None else C._jac_to_affine(
            _jac_scalar_mul((p[0], p[1], 1), n_inv)
        )
        for p in transformed
    ]

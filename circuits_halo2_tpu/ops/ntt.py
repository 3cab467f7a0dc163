"""Number-theoretic transform (radix-2 FFT over Fr) — host + device paths.

Replaces ``halo2_proofs::arithmetic::best_fft`` (SURVEY.md §2b). Semantics:
``ntt(a, omega)`` computes the DFT  out[i] = Σ_j a[j]·omega^{i·j}  for a
domain of size n = len(a) = 2^k where omega^n = 1. The inverse transform is
``ntt(a, omega^-1)`` scaled by n^{-1} (matching halo2's split convention).

Device path: limbs-leading (16, n) Montgomery tensors; each of the log2(n)
stages is one vectorized butterfly over the whole array (reshape, no
gathers), with per-stage twiddle tables precomputed host-side in Montgomery
form. Cross-chip sharding for large n lives in ``parallel/``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_jax as FJ


# ---------------------------------------------------------------------------
# Host path
# ---------------------------------------------------------------------------

def bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def ntt_host(a: list[int], omega: int) -> list[int]:
    """Iterative radix-2 DIT NTT on Python ints (reference path)."""
    n = len(a)
    assert n & (n - 1) == 0
    p = F.FR_MOD
    rev = bit_reverse_indices(n)
    out = [a[rev[i]] for i in range(n)]
    logn = n.bit_length() - 1
    for s in range(logn):
        half = 1 << s
        step = F.fr_pow(omega, n >> (s + 1))
        for start in range(0, n, 2 * half):
            w = 1
            for j in range(half):
                u = out[start + j]
                v = out[start + half + j] * w % p
                out[start + j] = (u + v) % p
                out[start + half + j] = (u - v) % p
                w = w * step % p
    return out


def intt_host(a: list[int], omega: int) -> list[int]:
    n = len(a)
    n_inv = F.fr_inv(n)
    res = ntt_host(a, F.fr_inv(omega))
    return [x * n_inv % F.FR_MOD for x in res]


def omega_for_k(k: int) -> int:
    """Primitive 2^k-th root of unity in Fr (halo2 domain omega)."""
    return F.fr_pow(F.FR_ROOT_OF_UNITY, 1 << (F.FR_TWO_ADICITY - k))


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------

_twiddle_cache: dict[tuple[int, int], list[np.ndarray]] = {}
_bitrev_cache: dict[int, np.ndarray] = {}


def _twiddles(n: int, omega: int) -> list[np.ndarray]:
    """Per-stage Montgomery twiddle tables [(16, 1, 1, half)] for stage s."""
    key = (n, omega)
    if key not in _twiddle_cache:
        logn = n.bit_length() - 1
        tables = []
        for s in range(logn):
            half = 1 << s
            step = F.fr_pow(omega, n >> (s + 1))
            ws = [1] * half
            for j in range(1, half):
                ws[j] = ws[j - 1] * step % F.FR_MOD
            mont = [(w << 256) % F.FR_MOD for w in ws]
            tables.append(FJ.ints_to_limbs(mont).reshape(16, 1, half))
        _twiddle_cache[key] = tables
    return _twiddle_cache[key]


def _bitrev(n: int) -> np.ndarray:
    if n not in _bitrev_cache:
        _bitrev_cache[n] = bit_reverse_indices(n)
    return _bitrev_cache[n]


def _ntt_core(a: jax.Array, n: int, omega: int) -> jax.Array:
    """Shape-polymorphic NTT body: a is (16, *batch, n); the transform runs
    along the last axis, batch dims ride for free (used standalone and as
    the local stage of the distributed four-step NTT)."""
    logn = n.bit_length() - 1
    rev = jnp.asarray(_bitrev(n))
    x = jnp.take(a, rev, axis=-1)
    tables = _twiddles(n, omega)
    for s in range(logn):
        half = 1 << s
        groups = n // (2 * half)
        xg = x.reshape(x.shape[:-1] + (groups, 2, half))
        u = xg[..., 0, :]
        t = jnp.asarray(tables[s]).reshape((16,) + (1,) * (u.ndim - 2) + (half,))
        v = FJ.mont_mul(xg[..., 1, :], t)
        top = FJ.add_mod(u, v)
        bot = FJ.sub_mod(u, v)
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape[:-1] + (n,))
    return x


@functools.partial(jax.jit, static_argnames=("n", "omega"))
def _ntt_device(a: jax.Array, n: int, omega: int) -> jax.Array:
    """a: (16, *batch, n) Montgomery limbs. Static (n, omega) → cached."""
    return _ntt_core(a, n, omega)


def ntt(a: jax.Array, omega: int) -> jax.Array:
    """Device NTT on a (16, *batch, n) Montgomery limb tensor (last axis)."""
    return _ntt_device(a, int(a.shape[-1]), omega)


def intt(a: jax.Array, omega: int) -> jax.Array:
    """Inverse device NTT (includes the n^{-1} scale)."""
    n = int(a.shape[-1])
    res = _ntt_device(a, n, F.fr_inv(omega))
    c = jnp.asarray(FJ.FR.const(F.fr_inv(n))).reshape((16,) + (1,) * (res.ndim - 1))
    return FJ.mont_mul(res, c)

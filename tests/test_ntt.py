"""NTT tests: host vs naive DFT, device vs host, roundtrip."""

import random

import jax.numpy as jnp
import numpy as np

from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import field_jax as FJ
from circuits_halo2_tpu.ops import ntt

rng = random.Random(7)


def naive_dft(a, omega):
    n = len(a)
    return [
        sum(a[j] * F.fr_pow(omega, i * j) for j in range(n)) % F.FR_MOD
        for i in range(n)
    ]


def to_mont(xs):
    return jnp.asarray(FJ.ints_to_limbs([(x << 256) % F.FR_MOD for x in xs]))


def from_mont(limbs):
    rinv = pow(1 << 256, -1, F.FR_MOD)
    return [(v * rinv) % F.FR_MOD for v in FJ.limbs_to_ints(np.asarray(limbs))]


def test_host_ntt_matches_naive():
    k = 3
    n = 1 << k
    omega = ntt.omega_for_k(k)
    a = [rng.randrange(F.FR_MOD) for _ in range(n)]
    assert ntt.ntt_host(a, omega) == naive_dft(a, omega)


def test_host_roundtrip():
    k = 5
    omega = ntt.omega_for_k(k)
    a = [rng.randrange(F.FR_MOD) for _ in range(1 << k)]
    assert ntt.intt_host(ntt.ntt_host(a, omega), omega) == a


def test_device_matches_host():
    k = 6
    n = 1 << k
    omega = ntt.omega_for_k(k)
    a = [rng.randrange(F.FR_MOD) for _ in range(n)]
    dev = from_mont(ntt.ntt(to_mont(a), omega))
    assert dev == ntt.ntt_host(a, omega)


def test_device_roundtrip():
    k = 8
    omega = ntt.omega_for_k(k)
    a = [rng.randrange(F.FR_MOD) for _ in range(1 << k)]
    back = from_mont(ntt.intt(ntt.ntt(to_mont(a), omega), omega))
    assert back == a


def test_fourstep_matches_host(monkeypatch):
    """Four-step (Bailey) large-n path vs ntt_host: odd and even log2 n,
    batch dim, and the inverse transform (ADVICE r2: the TPU-default
    fourstep path had no coverage — CI runs CPU where scan is default)."""
    monkeypatch.setenv("CIRCUITS_NTT_IMPL", "fourstep")
    monkeypatch.setattr(ntt, "SCAN_THRESHOLD", 64)
    for k in (7, 8):  # odd, even log2
        n = 1 << k
        omega = ntt.omega_for_k(k)
        rows = [[rng.randrange(F.FR_MOD) for _ in range(n)] for _ in range(2)]
        # batch dim forces a fresh trace (jit key includes the shape), so a
        # cached single-row compile from another test can't mask the impl.
        x = jnp.stack([to_mont(r) for r in rows], axis=1)  # (16, 2, n)
        out = np.asarray(ntt.ntt(x, omega))
        for b, row in enumerate(rows):
            assert from_mont(out[:, b, :]) == ntt.ntt_host(row, omega)
        back = np.asarray(ntt.intt(jnp.asarray(out), omega))
        for b, row in enumerate(rows):
            assert from_mont(back[:, b, :]) == row


def test_large_impl_env_validated(monkeypatch):
    monkeypatch.setenv("CIRCUITS_NTT_IMPL", "unrolled")
    import pytest

    with pytest.raises(ValueError):
        ntt._large_impl()
    monkeypatch.setenv("CIRCUITS_NTT_IMPL", "scan")
    assert ntt._large_impl() == "scan"


def test_omega_order():
    for k in (1, 4, 11):
        w = ntt.omega_for_k(k)
        assert F.fr_pow(w, 1 << k) == 1
        assert F.fr_pow(w, 1 << (k - 1)) == F.FR_MOD - 1

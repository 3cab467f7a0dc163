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


def test_omega_order():
    for k in (1, 4, 11):
        w = ntt.omega_for_k(k)
        assert F.fr_pow(w, 1 << k) == 1
        assert F.fr_pow(w, 1 << (k - 1)) == F.FR_MOD - 1

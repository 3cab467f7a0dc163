"""Unit tests for the device polynomial primitives (utils/poly_device):
log-depth scans, batched inversion, powers, point evaluation (coefficient
Horner-equivalent and Lagrange barycentric), and exact linear division.
These back the device-resident prover phases (models/prover.py)."""

import random

import pytest

from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.utils import poly_device as PD

P = F.FR_MOD
rng = random.Random(1234)


@pytest.fixture(scope="module")
def dom():
    return PD.Domain(8, 6)


def _vals(n):
    return [rng.randrange(P) for _ in range(n)]


def test_mont_cumprod(dom):
    vals = _vals(64)
    dev = PD.mont_cumprod(dom.to_device(vals))
    want = []
    acc = 1
    for v in vals:
        acc = acc * v % P
        want.append(acc)
    assert dom.from_device(dev) == want


def test_batch_inv_dev(dom):
    vals = _vals(128)
    dev = PD.batch_inv_dev(dom.to_device(vals))
    assert dom.from_device(dev) == [pow(v, -1, P) for v in vals]


def test_powers_dev(dom):
    x = rng.randrange(P)
    got = dom.from_device(PD.powers_dev(x, 32))
    assert got == [pow(x, i, P) for i in range(32)]


def test_eval_coeffs_at(dom):
    n = 256
    coeffs = _vals(n)
    x = rng.randrange(P)
    pw = PD.powers_dev(x, n)
    got = dom.scalars_from_device(PD.eval_coeffs_at(dom.to_device(coeffs), pw))
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % P
    assert got == [want]


def test_eval_coeffs_batched(dom):
    n = 128
    cols = [_vals(n) for _ in range(3)]
    x = rng.randrange(P)
    pw = PD.powers_dev(x, n)
    got = dom.scalars_from_device(PD.eval_coeffs_at(dom.cols_to_device(cols), pw))
    for g, coeffs in zip(got, cols):
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % P
        assert g == want


def test_lagrange_eval(dom):
    """Barycentric evaluation == coefficient-form Horner after iNTT."""
    from circuits_halo2_tpu.ops import ntt as NTT

    vals = _vals(dom.n)
    x = rng.randrange(P)
    weights = dom.lagrange_eval_weights(x)
    got = dom.scalars_from_device(dom.eval_lagrange(dom.to_device(vals), weights))
    coeffs = NTT.intt_host(vals, dom.omega)
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % P
    assert got == [want]


def test_divide_linear_dev(dom):
    n = 128
    z = rng.randrange(P)
    # construct exact multiple: p = (X - z) * q
    q = _vals(n - 1)
    p = [0] * n
    for i, c in enumerate(q):
        p[i + 1] = (p[i + 1] + c) % P
        p[i] = (p[i] - c * z) % P
    got = dom.from_device(PD.divide_linear_dev(dom.to_device(p), z))
    assert got[: n - 1] == q
    assert got[n - 1] == 0

"""BN254 pairing tests: bilinearity, checks, SRS consistency."""

from pathlib import Path

import pytest

from circuits_halo2_tpu.ops import curve as C
from circuits_halo2_tpu.ops import pairing as P

PTAU = Path(__file__).parent / "fixtures_ptau_hermez-raw-11"


def test_fq12_field_ops():
    x = P.FQ12(list(range(1, 13)))
    y = P.FQ12(list(range(3, 15)))
    assert x * x.inv() == P.FQ12.one()
    assert (x * y) * y.inv() == x
    assert x + y - y == x
    assert x ** 5 == x * x * x * x * x


def test_bilinearity():
    a, b = 7, 11
    lhs = P.pairing(C.g2_mul(C.G2_GEN, b), C.g1_mul(C.G1_GEN, a))
    rhs = P.pairing(C.G2_GEN, C.G1_GEN) ** (a * b)
    assert lhs == rhs


def test_pairing_check():
    good = P.pairing_check(
        [
            (C.g1_mul(C.G1_GEN, 6), C.G2_GEN),
            (C.g1_neg(C.g1_mul(C.G1_GEN, 2)), C.g2_mul(C.G2_GEN, 3)),
        ]
    )
    assert good
    bad = P.pairing_check(
        [
            (C.g1_mul(C.G1_GEN, 5), C.G2_GEN),
            (C.g1_neg(C.g1_mul(C.G1_GEN, 2)), C.g2_mul(C.G2_GEN, 3)),
        ]
    )
    assert not bad


def test_srs_is_consistent():
    """e([s]G, H) == e(G, [s]H) for the hermez trusted setup."""
    from circuits_halo2_tpu.utils.srs import ParamsKZG

    params = ParamsKZG.read(str(PTAU))
    assert P.pairing_check(
        [(params.g[1], params.g2), (C.g1_neg(params.g[0]), params.s_g2)]
    )

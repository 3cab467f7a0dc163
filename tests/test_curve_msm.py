"""Curve + MSM tests: host EC sanity, device Jacobian ops, MSM vs naive,
KZG SRS commitment consistency."""

import random
from pathlib import Path

import pytest

from circuits_halo2_tpu.ops import curve as C
from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import msm as M
from circuits_halo2_tpu.utils.srs import ParamsKZG

rng = random.Random(99)
PTAU = Path(__file__).parent / "fixtures_ptau_hermez-raw-11"


def test_g1_group_laws():
    g = C.G1_GEN
    g2 = C.g1_double(g)
    g3a = C.g1_add(g2, g)
    g3b = C.g1_add(g, g2)
    assert g3a == g3b
    assert C.g1_is_on_curve(g2) and C.g1_is_on_curve(g3a)
    assert C.g1_add(g, C.g1_neg(g)) is None
    assert C.g1_mul(g, F.FR_MOD) is None  # group order annihilates
    assert C.g1_mul(g, 5) == C.g1_add(C.g1_add(g3a, g), g)


def test_g2_group_laws():
    h = C.G2_GEN
    assert C.g2_is_on_curve(h)
    h2 = C.g2_double(h)
    assert C.g2_is_on_curve(h2)
    assert C.g2_add(h, C.g2_neg(h)) is None
    assert C.g2_mul(h, F.FR_MOD) is None


def test_serialization_roundtrip():
    p = C.g1_mul(C.G1_GEN, 12345)
    assert C.g1_from_bytes(C.g1_to_bytes(p)) == p
    assert C.g1_from_raw_bytes(C.g1_to_raw_bytes(p)) == p
    q = C.g2_mul(C.G2_GEN, 678)
    assert C.g2_from_raw_bytes(C.g2_to_raw_bytes(q)) == q
    assert C.g1_from_bytes(C.g1_to_bytes(None)) is None


def test_device_msm_matches_naive():
    n = 8
    points = [C.g1_mul(C.G1_GEN, rng.randrange(1, 2**60)) for _ in range(n)]
    scalars = [rng.randrange(F.FR_MOD) for _ in range(n)]
    want = C.g1_msm(points, scalars)
    got = M.msm(points, scalars)
    assert got == want


@pytest.mark.skipif(
    not __import__("os").environ.get("CIRCUITS_TPU_SLOW"),
    reason="device-path MSM at full chunk width; run with CIRCUITS_TPU_SLOW=1",
)
def test_device_msm_full_chunk():
    """Exercises the real device path (n = CHUNK) against the host MSM."""
    n = M.CHUNK
    base = [C.g1_mul(C.G1_GEN, i + 1) for i in range(16)]
    points = [base[i % 16] for i in range(n)]
    scalars = [rng.randrange(F.FR_MOD) for _ in range(n)]
    got = M.msm(points, scalars)
    agg = [0] * 16
    for i, s in enumerate(scalars):
        agg[i % 16] = (agg[i % 16] + s) % F.FR_MOD
    want = C.g1_msm(base, agg)
    assert got == want


def test_device_msm_edge_cases():
    g = C.G1_GEN
    # single point, scalar 1 / 0; infinity input; cancellation
    assert M.msm([g], [1]) == g
    assert M.msm([g], [0]) is None
    assert M.msm([g, None], [3, 5]) == C.g1_mul(g, 3)
    assert M.msm([g, g], [1, F.FR_MOD - 1]) is None
    assert M.msm([g, C.g1_neg(g)], [7, 7]) is None


def test_device_msm_nonpow2():
    n = 5
    points = [C.g1_mul(C.G1_GEN, i + 2) for i in range(n)]
    scalars = [rng.randrange(F.FR_MOD) for _ in range(n)]
    assert M.msm(points, scalars) == C.g1_msm(points, scalars)


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.read(str(PTAU))


def test_srs_commit_monomial_vs_device(params):
    coeffs = [rng.randrange(F.FR_MOD) for _ in range(6)]
    want = C.g1_msm(params.g[:6], coeffs)
    got = M.msm(params.g[:6], coeffs)
    assert got == want


def test_srs_lagrange_consistency(params):
    """Commit to X^2 in both bases: monomial [0,0,1] vs Lagrange evals w^{2i}."""
    omega = F.fr_pow(F.FR_ROOT_OF_UNITY, 1 << (F.FR_TWO_ADICITY - params.k))
    c_mono = params.g[2]
    evals = [F.fr_pow(omega, 2 * i) for i in range(params.n)]
    c_lag = params.commit_lagrange(evals)
    assert c_mono == c_lag


# ---------------------------------------------------------------------------
# Device Pippenger (production MSM path)
# ---------------------------------------------------------------------------

def _rand_points(n):
    return [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(n)]


def test_pippenger_device_matches_host():
    n = 64
    points = _rand_points(n)
    scalars = [rng.randrange(F.FR_MOD) for _ in range(n)]
    want = C.g1_msm_pippenger(points, scalars)
    got = M.msm_pippenger_device(points, [scalars])[0]
    assert got == want


def test_pippenger_device_batched_rows():
    n = 32
    points = _rand_points(n)
    rows = [
        [rng.randrange(F.FR_MOD) for _ in range(n)],
        [0] * n,                                    # all-zero row → infinity
        [1] + [0] * (n - 1),                        # bare first point
        [rng.randrange(F.FR_MOD) for _ in range(n // 2)],  # short row (padded)
    ]
    got = M.msm_pippenger_device(points, rows)
    assert got[0] == C.g1_msm_pippenger(points, rows[0])
    assert got[1] is None
    assert got[2] == points[0]
    assert got[3] == C.g1_msm_pippenger(points[: n // 2], rows[3])


def test_pippenger_device_edge_cases():
    g = C.G1_GEN
    # duplicate points in one bucket (forces the doubling branch of jac_add),
    # infinity inputs, cancelling pair, order-annihilated scalar
    points = [g, g, None, C.g1_neg(g), g, C.g1_mul(g, 7)]
    scalars = [5, 5, 123, 11, 11, F.FR_MOD]
    want = C.g1_msm_pippenger(points, scalars)
    got = M.msm_pippenger_device(points, [scalars])[0]
    assert got == want


def test_pippenger_device_single_bucket_saturation():
    # every scalar identical → one giant segment per window
    n = 16
    points = _rand_points(n)
    s = rng.randrange(F.FR_MOD)
    want = C.g1_msm_pippenger(points, [s] * n)
    got = M.msm_pippenger_device(points, [[s] * n])[0]
    assert got == want

"""SRS tests: unsafe setup consistency, EC-FFT Lagrange derivation,
downsize."""

from pathlib import Path

from circuits_halo2_tpu.ops import curve as C
from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import ntt as NTT
from circuits_halo2_tpu.ops import pairing as PAIR
from circuits_halo2_tpu.utils.ec_fft import ec_fft, g_to_lagrange
from circuits_halo2_tpu.utils.srs import ParamsKZG


def test_unsafe_setup_consistency():
    p = ParamsKZG.setup(3)
    omega = NTT.omega_for_k(3)
    evals = [F.fr_pow(omega, 2 * i) for i in range(8)]
    # commit X^2 in monomial and Lagrange bases must agree
    assert p.g[2] == C.g1_msm(p.g_lagrange, evals)
    assert PAIR.pairing_check([(p.g[1], p.g2), (C.g1_neg(p.g[0]), p.s_g2)])


def test_ec_fft_matches_scalar_dft():
    import random

    rng = random.Random(1)
    k, n = 3, 8
    omega = NTT.omega_for_k(k)
    scalars = [rng.randrange(1, 2**30) for _ in range(n)]
    points = [C.g1_mul(C.G1_GEN, s) for s in scalars]
    got = ec_fft(points, omega)
    want = [C.g1_mul(C.G1_GEN, s) for s in NTT.ntt_host(scalars, omega)]
    assert got == want


def test_g_to_lagrange_matches_analytic():
    p = ParamsKZG.setup(4)
    assert g_to_lagrange(p.g, 4) == p.g_lagrange


def test_downsize():
    p5 = ParamsKZG.setup(5)
    p4 = p5.downsize(4)
    assert p4.k == 4 and len(p4.g) == 16
    assert p4.g[:8] == p5.g[:8]
    omega = NTT.omega_for_k(4)
    evals = [F.fr_pow(omega, 3 * i) for i in range(16)]
    assert p4.g[3] == C.g1_msm(p4.g_lagrange, evals)


def test_write_read_roundtrip(tmp_path):
    p = ParamsKZG.setup(3)
    path = tmp_path / "test-raw-3"
    p.write(str(path))
    q = ParamsKZG.read(str(path))
    assert q.k == 3 and q.g == p.g and q.g_lagrange == p.g_lagrange
    assert q.g2 == p.g2 and q.s_g2 == p.s_g2


def test_ec_fft_device_matches_host():
    """Device EC-FFT (vectorized Jacobian butterflies) vs host path,
    including an infinity lane and the scaled inverse transform."""
    import random

    from circuits_halo2_tpu.utils import ec_fft as EC

    rng = random.Random(5)
    k, n = 4, 16
    omega = NTT.omega_for_k(k)
    scalars = [rng.randrange(1, F.FR_MOD) for _ in range(n)]
    points = [C.g1_mul(C.G1_GEN, s) for s in scalars]
    points[7] = None  # infinity lane must ride through untouched
    assert EC.ec_fft_device(points, omega) == ec_fft(points, omega)


def test_g_to_lagrange_device_path():
    """g_to_lagrange routed through the device EC-FFT (DEVICE_MIN forced
    low) is identical to the analytic Lagrange SRS."""
    from circuits_halo2_tpu.utils import ec_fft as EC

    p = ParamsKZG.setup(4)
    old = EC.DEVICE_MIN
    EC.DEVICE_MIN = 1
    try:
        assert g_to_lagrange(p.g, 4) == p.g_lagrange
    finally:
        EC.DEVICE_MIN = old

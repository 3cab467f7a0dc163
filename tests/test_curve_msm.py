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


@pytest.mark.skipif(
    not __import__("os").environ.get("CIRCUITS_TPU_SLOW"),
    reason="pallas interpret mode is minutes-slow; run with CIRCUITS_TPU_SLOW=1",
)
def test_pallas_segmented_scan_matches_xla():
    """ops/msm_pallas fused bucket scan == XLA segmented scan, byte-exact
    (interpret mode on CPU; the TPU path compiles the same kernel and is
    cross-checked against the host Pippenger at 2^13 in the TPU suite)."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from circuits_halo2_tpu.ops import curve as C
    from circuits_halo2_tpu.ops import field_jax as FJ
    from circuits_halo2_tpu.ops import msm as M

    rng = random.Random(2)
    n, B, W = 64, 1, 2
    pts = [C.g1_mul(C.G1_GEN, rng.randrange(1, 10**9)) for _ in range(n)]
    xs = jnp.asarray(FJ.ints_to_limbs([(p[0] << 256) % C.Q for p in pts]))
    ys = jnp.asarray(FJ.ints_to_limbs([(p[1] << 256) % C.Q for p in pts]))
    valid = np.ones(n, bool)
    valid[5] = False
    digits = (
        np.stack([np.sort(rng.choices(range(4), k=n)) for _ in range(B * W)])
        .reshape(B, W, n)
        .astype(np.int32)
    )
    seg = jnp.asarray(digits)
    px = jnp.broadcast_to(xs[:, None, None, :], (16, B, W, n))
    py = jnp.broadcast_to(ys[:, None, None, :], (16, B, W, n))
    pv = jnp.broadcast_to(jnp.asarray(valid), (B, W, n))

    ref = M._segmented_sum_parts(px, py, pv, seg)
    got = M._segmented_sum_parts_pallas(px, py, pv, seg, interpret=True)
    for k in range(3):
        assert (np.asarray(ref[0][k]) == np.asarray(got[0][k])).all()
        assert (np.asarray(ref[1][k]) == np.asarray(got[1][k])).all()
    assert (np.asarray(ref[2]) == np.asarray(got[2])).all()
    assert ref[3] == got[3]


@pytest.mark.skipif(
    not __import__("os").environ.get("CIRCUITS_TPU_SLOW"),
    reason="XLA:CPU compile of the per-limb graphs is minutes-slow; "
    "run with CIRCUITS_TPU_SLOW=1",
)
def test_msm_pallas_kernel_components():
    """Jitted checks of the kernel's building blocks: field-op
    congruence + envelope discipline over an op chain, jac_madd vs the
    host curve (incl. infinity/invalid/doubling/opposite lanes), and the
    16↔15-limb repack round trip. The fused kernel itself is validated in
    interpret mode (slow-gated above) and against the host Pippenger on
    real TPU hardware."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from circuits_halo2_tpu.ops import curve as C
    from circuits_halo2_tpu.ops import field_jax as FJ
    from circuits_halo2_tpu.ops import msm_pallas as MP

    Q, R15, NL = MP.Q, MP.R15, MP.NL
    rng = random.Random(11)
    N = 16

    def to15v(vals):
        return [
            jnp.asarray(
                np.array([[(v >> (15 * i)) & MP.MASK for v in vals]], dtype=np.uint32)
            )
            for i in range(NL)
        ]

    def vals_of(limbs):
        arrs = [np.asarray(l).reshape(-1) for l in limbs]
        return [
            sum(int(arrs[i][j]) << (15 * i) for i in range(len(arrs)))
            for j in range(len(arrs[0]))
        ]

    # field chain: mul/sub/add/dbl congruence + envelope
    A = [rng.randrange(Q) for _ in range(N)]
    W_ = [rng.randrange(Q) for _ in range(N)]

    def chain(v, wm, wr):
        for _ in range(3):
            v = MP._mm(v, wm)
            v = MP._sub(v, wr)
            v = MP._add(v, wr)
            v = MP._dbl(v)
        return v

    v0 = to15v([a * R15 % Q for a in A])
    wm = to15v([w * R15 % Q for w in W_])
    wr = to15v(W_)
    got = vals_of(jax.jit(chain)(v0, wm, wr))
    rinv = pow(R15, -1, Q)
    for j in range(N):
        ref = A[j] * R15 % Q
        for _ in range(3):
            ref = ref * (W_[j] * R15 % Q) * rinv % Q
            ref = 2 * ref % Q  # (−w + w) cancels
        assert got[j] % Q == ref
        assert got[j] < 6 * Q, "envelope blown"

    # jac_madd vs host incl. special cases
    pts = [C.g1_mul(C.G1_GEN, rng.randrange(1, 10**9)) for _ in range(N)]
    accs = [C.g1_mul(C.G1_GEN, rng.randrange(1, 10**9)) for _ in range(N)]
    acc_jac = list(accs)
    acc_jac[0] = None                                  # p at infinity
    acc_jac[2] = pts[2]                                # equal → doubling
    acc_jac[3] = (pts[3][0], Q - pts[3][1])            # opposite → infinity
    valid = [0 if j == 1 else 1 for j in range(N)]

    def m15(v):
        return v * R15 % Q

    X1 = to15v([m15(a[0]) if a else 0 for a in acc_jac])
    Y1 = to15v([m15(a[1]) if a else 0 for a in acc_jac])
    Z1 = to15v([m15(1) if a else 0 for a in acc_jac])
    X2 = to15v([m15(p[0]) for p in pts])
    Y2 = to15v([m15(p[1]) for p in pts])
    V = jnp.asarray(np.array([valid], dtype=np.uint32))
    x3, y3, z3 = jax.jit(MP._jac_madd)((X1, Y1, Z1), (X2, Y2, V))
    xs, ys, zs = vals_of(x3), vals_of(y3), vals_of(z3)
    for j in range(N):
        want = C.g1_add(acc_jac[j], pts[j] if valid[j] else None)
        z = zs[j] * rinv % Q
        if want is None:
            assert z == 0
        else:
            zi = pow(z, -1, Q)
            zi2 = zi * zi % Q
            assert (xs[j] * rinv % Q * zi2 % Q,
                    ys[j] * rinv % Q * zi2 % Q * zi % Q) == want

    # repack round trip
    a16 = jnp.asarray(FJ.ints_to_limbs(A))
    assert FJ.limbs_to_ints(
        np.asarray(MP.repack_15_to_16(MP.repack_16_to_15(a16)))
    ) == A


@pytest.mark.skipif(
    not __import__("os").environ.get("CIRCUITS_TPU_TEST_REAL"),
    reason="real-TPU kernel parity; run with CIRCUITS_TPU_TEST_REAL=1",
)
def test_msm_pallas_matches_host_on_tpu():
    """Full fused-kernel MSM vs the host Pippenger at 2^13 on real TPU."""
    import random

    from circuits_halo2_tpu.ops import curve as C
    from circuits_halo2_tpu.ops import field as F
    from circuits_halo2_tpu.ops import msm as M

    rng = random.Random(1)
    n = 1 << 13
    pts = [C.g1_mul(C.G1_GEN, rng.randrange(1, C.Q)) for _ in range(256)] * (n // 256)
    scal = [rng.randrange(F.FR_MOD) for _ in range(n)]
    out = M.msm_pippenger_device(pts, [scal])
    assert out[0] == C.g1_msm_pippenger(pts, scal)

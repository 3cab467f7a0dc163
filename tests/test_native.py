"""Native C++ host runtime (circuits_halo2_tpu/native) parity tests.

Every native entry point is checked bit-exactly against the pure-Python
reference implementation it accelerates (SURVEY.md §2b: halo2curves field
and curve arithmetic, `best_multiexp` Pippenger, keccak256, the
halo2_gadgets ConstantLength Poseidon sponge).
"""

import random

import numpy as np
import pytest

from circuits_halo2_tpu import native as N
from circuits_halo2_tpu.ops import curve as C
from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import field_jax as FJ
from circuits_halo2_tpu.ops import poseidon as PS
from circuits_halo2_tpu.ops.keccak import _keccak256_py

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native library unavailable (g++ missing?)"
)

rng = random.Random(0xC0FFEE)


def _rand_fr(n):
    return [rng.randrange(F.FR_MOD) for _ in range(n)]


def test_limbs16_roundtrip_and_mont():
    xs = _rand_fr(33) + [0, 1, F.FR_MOD - 1]
    limbs = N.ints_to_limbs16(xs)
    assert limbs.shape == (16, len(xs))
    # plain roundtrip
    assert N.limbs16_to_ints(limbs) == xs
    # layout parity with the device format (ops/field_jax.py)
    np.testing.assert_array_equal(limbs, FJ.ints_to_limbs(xs))
    # Montgomery in/out roundtrip
    mont = N.ints_to_limbs16(xs, to_mont=True)
    assert N.limbs16_to_ints(mont, from_mont=True) == xs
    assert N.limbs16_to_ints(mont) == [(x << 256) % F.FR_MOD for x in xs]


def test_limbs16_with_carries():
    # device kernels can leave limbs up to 2^32; conversion must carry-fold
    xs = _rand_fr(8)
    limbs = FJ.ints_to_limbs(xs).astype(np.uint64)
    bumped = limbs.astype(np.uint32).copy()
    # add 0x30000 to limb 2 of element 0 and subtract 3<<16 from elem value
    bumped[2, 0] += 0x30000
    expect = list(xs)
    expect[0] = (expect[0] + (0x30000 << 32)) % F.FR_MOD
    got = N.limbs16_to_ints(bumped)
    assert got[0] == expect[0] % F.FR_MOD
    assert got[1:] == xs[1:]


def test_batch_inv():
    xs = _rand_fr(100)
    xs[7] = 0  # zeros pass through
    assert N.batch_inv(xs) == F.batch_inv(xs)
    # and the field.batch_inv native fast path agrees with itself
    assert F.batch_inv(xs) == [0 if x == 0 else pow(x, -1, F.FR_MOD) for x in xs]


def test_msm_parity():
    for n in (1, 2, 7, 65, 300):
        pts = [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(n)]
        scs = _rand_fr(n)
        scs[0] = 0  # zero scalar
        if n > 2:
            pts[1] = None  # infinity point
        assert N.g1_msm(pts, scs) == C.g1_msm(pts, scs)


def test_fixed_base_muls():
    scs = _rand_fr(20) + [0, 1]
    got = N.g1_fixed_base_muls(C.G1_GEN, scs)
    assert got == [C.g1_mul(C.G1_GEN, s) for s in scs]


def test_keccak256_parity():
    msgs = [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 137, bytes(range(256)) * 3]
    for m in msgs:
        assert N.keccak256(m) == _keccak256_py(m)
    assert N.keccak256_batch(msgs) == [_keccak256_py(m) for m in msgs]


def test_poseidon_parity():
    for L in (1, 2, 3, 4):
        batch = [[rng.randrange(F.FR_MOD) for _ in range(L)] for _ in range(5)]
        got = N.poseidon_hash_batch(batch, L)
        want = [PS._hash_n_py(row) for row in batch]
        assert got == want


def test_g1_add_batch():
    n = 9
    ps = [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(n)]
    qs = [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(n)]
    qs[3] = None
    ps[4] = None
    ps[5] = qs[5]  # doubling case
    qs[6] = (ps[6][0], (-ps[6][1]) % C.Q)  # P + (-P) = inf
    a = N.points_to_bytes(ps)
    b = N.points_to_bytes(qs)
    out = np.empty((n, 64), dtype=np.uint8)
    N.get().g1_add_batch(N._u8ptr(a), N._u8ptr(b), n, N._u8ptr(out))
    for i in range(n):
        assert N.bytes_to_point(out[i]) == C.g1_add(ps[i], qs[i])

"""Field arithmetic tests: JAX limb path vs Python-int reference path."""

import random

import numpy as np
import jax.numpy as jnp

from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import field_jax as FJ

rng = random.Random(1234)


def rand_fr(n):
    return [rng.randrange(F.FR_MOD) for _ in range(n)]


def to_dev_mont(xs, spec=FJ.FR):
    mont = [(x << 256) % spec.mod_int for x in xs]
    return jnp.asarray(FJ.ints_to_limbs(mont))


def from_dev_mont(limbs, spec=FJ.FR):
    vals = FJ.limbs_to_ints(np.asarray(limbs))
    rinv = pow(1 << 256, -1, spec.mod_int)
    return [(v * rinv) % spec.mod_int for v in vals]


def test_limb_roundtrip():
    xs = rand_fr(17) + [0, 1, F.FR_MOD - 1]
    limbs = FJ.ints_to_limbs(xs)
    assert FJ.limbs_to_ints(limbs) == xs


def test_mont_mul_matches_reference():
    n = 64
    a, b = rand_fr(n), rand_fr(n)
    got = from_dev_mont(FJ.mont_mul(to_dev_mont(a), to_dev_mont(b)))
    want = [F.fr_mul(x, y) for x, y in zip(a, b)]
    assert got == want


def test_mont_mul_edge_cases():
    edge = [0, 1, 2, F.FR_MOD - 1, F.FR_MOD - 2, (F.FR_MOD - 1) // 2]
    a = [x for x in edge for _ in edge]
    b = [y for _ in edge for y in edge]
    got = from_dev_mont(FJ.mont_mul(to_dev_mont(a), to_dev_mont(b)))
    want = [F.fr_mul(x, y) for x, y in zip(a, b)]
    assert got == want


def test_add_sub_neg():
    n = 48
    a, b = rand_fr(n), rand_fr(n)
    a[:3] = [0, F.FR_MOD - 1, 1]
    b[:3] = [0, F.FR_MOD - 1, F.FR_MOD - 1]
    da, db = to_dev_mont(a), to_dev_mont(b)
    assert from_dev_mont(FJ.add_mod(da, db)) == [F.fr_add(x, y) for x, y in zip(a, b)]
    assert from_dev_mont(FJ.sub_mod(da, db)) == [F.fr_sub(x, y) for x, y in zip(a, b)]
    assert from_dev_mont(FJ.neg_mod(da)) == [F.fr_neg(x) for x in a]


def test_to_from_mont_roundtrip():
    xs = rand_fr(32)
    raw = jnp.asarray(FJ.ints_to_limbs(xs))
    mont = FJ.to_mont(raw)
    back = FJ.from_mont(mont)
    assert FJ.limbs_to_ints(np.asarray(back)) == xs


def test_pow5_and_inverse():
    xs = rand_fr(16)
    d = to_dev_mont(xs)
    assert from_dev_mont(FJ.pow5(d)) == [F.fr_pow(x, 5) for x in xs]
    inv = from_dev_mont(FJ.inv_mont(d))
    assert inv == [F.fr_inv(x) for x in xs]


def test_inverse_of_zero_is_zero():
    d = to_dev_mont([0, 5])
    got = from_dev_mont(FJ.inv_mont(d))
    assert got[0] == 0 and got[1] == F.fr_inv(5)


def test_fq_field():
    xs, ys = rand_fr(8), rand_fr(8)  # values < FR_MOD < FQ_MOD, fine as Fq
    da = to_dev_mont(xs, FJ.FQ)
    db = to_dev_mont(ys, FJ.FQ)
    got = from_dev_mont(FJ.mont_mul(da, db, FJ.FQ), FJ.FQ)
    assert got == [x * y % F.FQ_MOD for x, y in zip(xs, ys)]


def test_batch_inv_host():
    xs = rand_fr(10)
    xs[3] = 0
    out = F.batch_inv(xs)
    for x, i in zip(xs, out):
        assert i == (0 if x == 0 else F.fr_inv(x))


def test_field_constants():
    assert pow(F.FR_ROOT_OF_UNITY, 1 << 28, F.FR_MOD) == 1
    assert pow(F.FR_ROOT_OF_UNITY, 1 << 27, F.FR_MOD) == F.FR_MOD - 1
    assert (F.FR_MOD * F.FR_NPRIME) % (1 << 256) == (1 << 256) - 1

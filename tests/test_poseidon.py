"""Poseidon tests: Grain parity, host-vs-device agreement, sponge semantics."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import field_jax as FJ
from circuits_halo2_tpu.ops import poseidon
from circuits_halo2_tpu.ops.grain import generate_poseidon_params


def test_grain_reproduces_constants():
    """The Grain LFSR derivation must reproduce the extracted parameters
    (independently validates poseidon_constants.json against the documented
    generation command)."""
    rc, mds, mds_inv = generate_poseidon_params(t=2, r_f=8, r_p=56)
    assert rc == poseidon.ROUND_CONSTANTS
    assert mds == poseidon.MDS
    assert mds_inv == poseidon.MDS_INV


def test_mds_inverse_consistent():
    p = F.FR_MOD
    for i in range(2):
        for j in range(2):
            v = sum(poseidon.MDS[i][k] * poseidon.MDS_INV[k][j] for k in range(2)) % p
            assert v == (1 if i == j else 0)


def test_host_device_permutation_agree():
    state_pairs = [[3, 7], [0, 0], [F.FR_MOD - 1, 123456789]]
    host = [poseidon.permute(list(s)) for s in state_pairs]

    n = len(state_pairs)
    s0 = np.zeros((16, n), np.uint32)
    s1 = np.zeros((16, n), np.uint32)
    for j, (a, b) in enumerate(state_pairs):
        s0[:, j] = FJ.int_to_limbs((a << 256) % F.FR_MOD)
        s1[:, j] = FJ.int_to_limbs((b << 256) % F.FR_MOD)
    import jax

    d0, d1 = jax.jit(poseidon.permute_batch)(jnp.asarray(s0), jnp.asarray(s1))
    rinv = pow(1 << 256, -1, F.FR_MOD)
    got0 = [(v * rinv) % F.FR_MOD for v in FJ.limbs_to_ints(np.asarray(d0))]
    got1 = [(v * rinv) % F.FR_MOD for v in FJ.limbs_to_ints(np.asarray(d1))]
    for k in range(n):
        assert [got0[k], got1[k]] == host[k]


def test_hash_host_device_agree():
    msgs = [[1, 2, 3], [0, 0, 0], [F.FR_MOD - 1, 5, 7], [42, 424242, 2**64]]
    host = [poseidon.hash_n(m) for m in msgs]
    dev = poseidon.hash_many(msgs)
    assert host == dev


def test_hash_length_domain_separation():
    """ConstantLength<L> binds L into the capacity: same words, different L
    must differ."""
    h2 = poseidon.hash_n([1, 2])
    h3 = poseidon.hash_n([1, 2, 0])
    assert h2 != h3

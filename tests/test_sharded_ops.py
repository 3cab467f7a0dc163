"""Distributed MSM / NTT over the virtual 8-device CPU mesh (SURVEY §2c).

These validate the cross-chip layouts (shard_map + all_to_all / all_gather)
that the driver's ``dryrun_multichip`` exercises, against the host reference
implementations.
"""

import random

import pytest

from circuits_halo2_tpu.ops import curve as C
from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import ntt as NTT
from circuits_halo2_tpu.parallel import msm_sharded as MS
from circuits_halo2_tpu.parallel import ntt_sharded as NS
from circuits_halo2_tpu.parallel.sharding import make_mesh

rng = random.Random(1234)


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return make_mesh(8)


def test_ntt_sharded_matches_host(mesh):
    n = 1 << 10
    omega = NTT.omega_for_k(10)
    vals = [rng.randrange(F.FR_MOD) for _ in range(n)]
    got = NS.ntt_sharded_host(mesh, vals, omega)
    want = NTT.ntt_host(vals, omega)
    assert got == want


def test_ntt_sharded_roundtrip(mesh):
    n = 1 << 9
    omega = NTT.omega_for_k(9)
    vals = [rng.randrange(F.FR_MOD) for _ in range(n)]
    fwd = NS.ntt_sharded_host(mesh, vals, omega)
    n_inv = F.fr_inv(n)
    back = [v * n_inv % F.FR_MOD for v in NS.ntt_sharded_host(mesh, fwd, F.fr_inv(omega))]
    assert back == vals


def test_msm_sharded_matches_host(mesh):
    n = 64
    points = [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(n)]
    rows = [
        [rng.randrange(F.FR_MOD) for _ in range(n)],
        [0] * n,
    ]
    got = MS.msm_sharded(mesh, points, rows)
    assert got[0] == C.g1_msm_pippenger(points, rows[0])
    assert got[1] is None

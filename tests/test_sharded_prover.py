"""Sharded prover — BASELINE config 4 (sharded MSM/NTT inside the proving
pipeline, one host, 8-device mesh).

The prover's commitment MSMs (ops/msm.msm_commit_dev) and large NTTs
(ops/ntt.ntt/intt) route through parallel/{msm,ntt}_sharded when a mesh is
configured (parallel/auto). These tests run the FULL prove on the virtual
8-device CPU mesh and assert the proof bytes are IDENTICAL to the
single-device proof (deterministic blinding makes proofs reproducible), so
sharding provably does not change a single transcript byte.

Reference seam: halo2's create_proof phases (SURVEY §3.1); the reference
parallelizes them with rayon threads, this build with mesh collectives.
"""

import json
import os
from pathlib import Path

import pytest

from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.models.keygen import keygen
from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit, compile_circuit
from circuits_halo2_tpu.models.prover import prove
from circuits_halo2_tpu.models.verifier import verify
from circuits_halo2_tpu.parallel import auto, sharding
from circuits_halo2_tpu.utils.srs import ParamsKZG

HERE = Path(__file__).parent
VK_FIX = json.loads((HERE / "fixtures_vk_inclusion.json").read_text())

pytestmark = pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="full proving pipeline on a mesh (~minutes); run with CIRCUITS_TPU_SLOW=1",
)


@pytest.fixture
def mesh8():
    mesh = sharding.make_mesh(8)
    auto.set_mesh(mesh)
    yield mesh
    auto.set_mesh(None)


def _prove_entry16(k: int):
    vkd = int(VK_FIX["vk_digest"], 16)
    params = ParamsKZG.read(str(HERE / "fixtures_ptau_hermez-raw-11"))
    if k != params.k:
        pytest.skip("fixture SRS is k=11")
    _, cs, config, asn = compile_circuit(4, 2, 8, k)
    vk, pk = keygen(params, cs, asn)
    tree = MerkleSumTree.from_csv(str(HERE / "fixtures_csv/entry_16.csv"))
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    proof = prove(params, pk, circuit, config, instances, vk_digest=vkd)
    return params, vk, instances, proof, vkd


def test_sharded_prove_bit_identical_k11(mesh8):
    # single-device reference proof (mesh cleared for the baseline run)
    auto.set_mesh(None)
    _, _, _, proof_single, _ = _prove_entry16(11)
    auto.set_mesh(mesh8)
    params, vk, instances, proof_sharded, vkd = _prove_entry16(11)
    assert proof_sharded == proof_single, "sharding changed proof bytes"
    assert verify(params, vk, instances, proof_sharded, vk_digest=vkd)


def test_sharded_msm_matches_single_device(mesh8):
    """Direct seam check: msm_commit_dev with/without mesh, same points."""
    import numpy as np
    import jax.numpy as jnp

    from circuits_halo2_tpu.ops import curve as C
    from circuits_halo2_tpu.ops import field as F
    from circuits_halo2_tpu.ops import field_jax as FJ
    from circuits_halo2_tpu.ops import msm as M

    rng = np.random.default_rng(3)
    npts = 2048
    pts = [C.g1_mul(C.G1_GEN, int(rng.integers(1, 1 << 62))) for _ in range(64)]
    pts = pts * (npts // 64)
    scal = [int(rng.integers(0, 1 << 62)) for _ in range(npts)]
    mont = jnp.asarray(
        FJ.ints_to_limbs([s * (1 << 256) % F.FR_MOD for s in scal])
    ).reshape(16, 1, npts)

    prev = os.environ.get("CIRCUITS_MSM_DEVICE")
    os.environ["CIRCUITS_MSM_DEVICE"] = "1"
    try:
        sharded = M.msm_commit_dev(pts, mont)[0]
        auto.set_mesh(None)
        single = M.msm_commit_dev(pts, mont)[0]
    finally:
        if prev is None:
            os.environ.pop("CIRCUITS_MSM_DEVICE", None)
        else:
            os.environ["CIRCUITS_MSM_DEVICE"] = prev
    assert sharded == single == C.g1_msm_pippenger(pts, scal)


def test_sharded_ntt_matches_single_device(mesh8):
    import numpy as np
    import jax.numpy as jnp

    from circuits_halo2_tpu.ops import field as F
    from circuits_halo2_tpu.ops import field_jax as FJ
    from circuits_halo2_tpu.ops import ntt as NTT

    n = 8192  # ≥ SHARD_THRESHOLD → sharded four-step path
    rng = np.random.default_rng(4)
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    a = jnp.asarray(FJ.ints_to_limbs([v * (1 << 256) % F.FR_MOD for v in vals]))
    omega = NTT.omega_for_k(13)
    sharded = np.asarray(NTT.ntt(a, omega))
    auto.set_mesh(None)
    single = np.asarray(NTT.ntt(a, omega))
    assert (sharded == single).all()

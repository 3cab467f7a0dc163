"""End-to-end prove/verify slice (SURVEY §7 minimum slice, full-KZG stage):
CSV → MST → MstInclusion witness → KZG+SHPLONK proof (EVM transcript) →
verification. Proof byte-length must equal the reference's (2144).

Also the DEFAULT-suite mesh-prover regression test (VERDICT r2 #9): the
same prove on the virtual 8-device mesh, byte-identical to single-device.
Keygen/params/witness are shared via a module fixture so the mesh run only
pays the sharded-prover compile, not a second keygen.
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

# Ungated (VERDICT r1 #8): the DEFAULT suite must prove end-to-end. One
# k=11 keygen+prove+verify is ~2.5 min warm on a 4-core CPU host.


@pytest.fixture(scope="module")
def setup():
    vkd = int(VK_FIX["vk_digest"], 16)
    params = ParamsKZG.read(str(HERE / "fixtures_ptau_hermez-raw-11"))
    _, cs, config, asn = compile_circuit(4, 2, 8, 11)
    vk, pk = keygen(params, cs, asn)
    tree = MerkleSumTree.from_csv(str(HERE / "fixtures_csv/entry_16.csv"))
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    return {
        "vkd": vkd,
        "params": params,
        "config": config,
        "vk": vk,
        "pk": pk,
        "circuit": circuit,
        "instances": circuit.instances(),
    }


def test_prove_and_verify_entry_16(setup):
    s = setup
    proof = prove(
        s["params"], s["pk"], s["circuit"], s["config"], s["instances"],
        vk_digest=s["vkd"],
    )
    assert len(proof) == 2144  # reference EVM proof size
    assert verify(s["params"], s["vk"], s["instances"], proof, vk_digest=s["vkd"])
    # soundness: flipped instance rejected
    bad = [list(s["instances"][0])]
    bad[0][2] += 1
    assert not verify(s["params"], s["vk"], bad, proof, vk_digest=s["vkd"])
    s["proof_single"] = proof


def test_batch_prove_bit_identical(setup):
    """Cross-user batched proving (SURVEY §7 throughput lever): a U=2 batch
    through models/prover_batch must produce proofs byte-identical to two
    independent single-user proves — same blinding order, same transcript
    framing — so batching can never change a proof."""
    from circuits_halo2_tpu.merkle.mst import MerkleSumTree
    from circuits_halo2_tpu.models.prover_batch import prove_batch

    s = setup
    tree = MerkleSumTree.from_csv(str(HERE / "fixtures_csv/entry_16.csv"))
    c1 = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(1))
    single0 = s.get("proof_single") or prove(
        s["params"], s["pk"], s["circuit"], s["config"], s["instances"],
        vk_digest=s["vkd"])
    single1 = prove(s["params"], s["pk"], c1, s["config"], c1.instances(),
                    vk_digest=s["vkd"])
    batch = prove_batch(
        s["params"], s["pk"], [s["circuit"], c1], s["config"],
        [s["instances"], c1.instances()], vk_digest=s["vkd"])
    assert batch[0] == single0, "batched proof (user 0) diverged"
    assert batch[1] == single1, "batched proof (user 1) diverged"
    assert verify(s["params"], s["vk"], c1.instances(), batch[1],
                  vk_digest=s["vkd"])


def test_mesh_prove_bit_identical(setup):
    """Ungated mesh-prover seam test (VERDICT r2 #9): prove on the 8-device
    mesh (phase MSMs ≥2048 lanes and extended-domain NTTs ≥4096 route
    through parallel/{msm,ntt}_sharded at k=11) and require the bytes to
    equal the single-device proof — deterministic blinding makes any
    sharding regression a hard byte mismatch, not a silent slowdown."""
    s = setup
    single = s.get("proof_single")
    if single is None:  # -k selected this test alone: pay the baseline run
        single = prove(
            s["params"], s["pk"], s["circuit"], s["config"], s["instances"],
            vk_digest=s["vkd"],
        )
    mesh = sharding.make_mesh(8)
    auto.set_mesh(mesh)
    try:
        proof_mesh = prove(
            s["params"], s["pk"], s["circuit"], s["config"], s["instances"],
            vk_digest=s["vkd"],
        )
    finally:
        auto.set_mesh(None)
    assert proof_mesh == single, "mesh sharding changed proof bytes"


def test_batch_prove_verifies_through_pipeline(setup):
    """Transcript-pairing regression (round-3 campaign crash): prove_batch
    with the native Blake2b transcript must verify through the same
    Blake2b replay the pipeline verifier uses. The crashed batch bench
    stage fed KECCAK-transcript proofs to the Blake2b verifier — a
    harness mismatch that looked like a device-numerics failure on TPU
    (diagnosed by scripts/diag_batch_tpu.py). Runs on the real chip too
    with CIRCUITS_TPU_TEST_REAL=1."""
    from circuits_halo2_tpu.models.prover_batch import prove_batch
    from circuits_halo2_tpu.utils.transcript import Blake2bTranscript

    s = setup
    batch = prove_batch(
        s["params"], s["pk"], [s["circuit"]], s["config"], [s["instances"]],
        transcript_cls=Blake2bTranscript, vk_digest=s["vkd"])
    assert verify(s["params"], s["vk"], s["instances"], batch[0],
                  transcript_cls=Blake2bTranscript, vk_digest=s["vkd"])
    # and the pipeline prover's bytes match the batch prover's (native path)
    single = prove(
        s["params"], s["pk"], s["circuit"], s["config"], s["instances"],
        transcript_cls=Blake2bTranscript, vk_digest=s["vkd"])
    assert batch[0] == single

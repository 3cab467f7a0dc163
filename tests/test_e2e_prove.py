"""End-to-end prove/verify slice (SURVEY §7 minimum slice, full-KZG stage):
CSV → MST → MstInclusion witness → KZG+SHPLONK proof (EVM transcript) →
verification. Proof byte-length must equal the reference's (2144)."""

import json
import os
from pathlib import Path


from circuits_halo2_tpu.merkle.mst import MerkleSumTree
from circuits_halo2_tpu.models.keygen import keygen
from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit, compile_circuit
from circuits_halo2_tpu.models.prover import BlindingRng, prove
from circuits_halo2_tpu.models.verifier import verify
from circuits_halo2_tpu.utils.srs import ParamsKZG

HERE = Path(__file__).parent
VK_FIX = json.loads((HERE / "fixtures_vk_inclusion.json").read_text())

# Ungated (VERDICT r1 #8): the DEFAULT suite must prove end-to-end. One
# k=11 keygen+prove+verify is ~2.5 min warm on a 4-core CPU host.


def test_prove_and_verify_entry_16():
    vkd = int(VK_FIX["vk_digest"], 16)
    params = ParamsKZG.read(str(HERE / "fixtures_ptau_hermez-raw-11"))
    _, cs, config, asn = compile_circuit(4, 2, 8, 11)
    vk, pk = keygen(params, cs, asn)
    tree = MerkleSumTree.from_csv(str(HERE / "fixtures_csv/entry_16.csv"))
    circuit = MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(0))
    instances = circuit.instances()
    proof = prove(params, pk, circuit, config, instances, vk_digest=vkd)
    assert len(proof) == 2144  # reference EVM proof size
    assert verify(params, vk, instances, proof, vk_digest=vkd)
    # soundness: flipped instance rejected
    bad = [list(instances[0])]
    bad[0][2] += 1
    assert not verify(params, vk, bad, proof, vk_digest=vkd)

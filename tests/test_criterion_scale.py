"""Criterion-config prove/verify at the reference's own benchmark scale.

The reference's criterion suite proves MstInclusion at LEVELS=20, k=13 as a
routine stage (`zk_prover/benches/full_solvency_flow.rs:88-116`). These
tests pin that config end-to-end (witness → prove → verify) plus the
north-star k=17 shape, using `synthetic_merkle_proof` so no 2^20-leaf tree
build is needed — the prover sees a witness indistinguishable from one cut
out of a full tree.

Gated behind CIRCUITS_TPU_SLOW: a k=13 prove is minutes on CPU (the TPU
bench campaign runs the same config against the real device tree).
"""

import os

import pytest

from circuits_halo2_tpu.merkle.mst import Entry, MerkleSumTree, synthetic_merkle_proof
from circuits_halo2_tpu.models.mock_prover import MockProver
from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit

slow = pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="criterion-scale prove; run with CIRCUITS_TPU_SLOW=1",
)


def test_synthetic_witness_replays():
    for levels, ncur in ((20, 1), (16, 2), (4, 2)):
        p = synthetic_merkle_proof(levels, ncur, Entry("dxGaEAii", [11888] * ncur))
        assert MerkleSumTree.verify_proof(p)


def test_synthetic_witness_mock_prover_levels8():
    # deep-circuit MockProver sanity at a depth within default-suite budget
    proof = synthetic_merkle_proof(8, 2, Entry("dxGaEAii", [11888, 41163]))
    circuit = MstInclusionCircuit.init(8, 2, 8, proof)
    assert MockProver(12, circuit, circuit.instances()).verify() == []


@slow
def test_criterion_config_prove_verify_k13():
    from circuits_halo2_tpu.utils import pipeline
    from circuits_halo2_tpu.utils.srs import ParamsKZG

    levels, ncur, nbytes, k = 20, 1, 8, 13
    proof_w = synthetic_merkle_proof(levels, ncur, Entry("dxGaEAii", [11888]))
    circuit = MstInclusionCircuit.init(levels, ncur, nbytes, proof_w)
    instances = circuit.instances()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    srs = os.path.join(here, ".bench_srs_k13.bin")
    if not os.path.exists(srs):
        ParamsKZG.setup(k).write(srs)
    art = pipeline.generate_setup_artifacts(k, srs, levels, ncur, nbytes)
    proof = pipeline.full_prover(art, circuit, instances)
    assert pipeline.full_verifier(art, proof, instances)

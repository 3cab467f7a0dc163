"""Backend tests — operator round flow against the in-process chain sim.

Mirrors the reference's backend integration tests (`backend/src/tests.rs:
124-298`): ownership events, concurrent commitment submission (nonce-lock
race test), full round with on-chain inclusion verification — minus the
Anvil devnet, replaced by the Summa state-machine simulation.
"""

import json
import os
import threading
from pathlib import Path

import pytest

from circuits_halo2_tpu.backend.address_ownership import (
    AddressOwnership,
    parse_signature_csv,
)
from circuits_halo2_tpu.backend.apis import leaf_hash_from_inputs
from circuits_halo2_tpu.backend.signer import AddressInput, SummaSigner
from circuits_halo2_tpu.contracts.summa_sim import Cryptocurrency, SummaContractSim
from circuits_halo2_tpu.merkle.mst import MerkleSumTree

HERE = Path(__file__).parent
CSV = HERE / "fixtures_csv"

GOLDEN_ROOT_16 = 0x177BF452AD139F067A64FE09FDC30AAE46144D60ABFA2AD9F0C70928E29A26D1


@pytest.fixture()
def summa():
    return SummaContractSim(lambda p, i: True, 4, 2, 8)


@pytest.fixture()
def signer(summa):
    return SummaSigner("0x" + "11" * 32, summa, sender=summa.owner)


def test_signature_csv_parsing():
    proofs = parse_signature_csv(str(CSV / "signatures.csv"))
    assert len(proofs) == 2
    assert proofs[0].chain == "ETH"
    assert proofs[0].cex_address.startswith("0x")
    assert "Summa proof of solvency" in proofs[0].message


def test_ownership_dedup(summa, signer):
    ownership = AddressOwnership(signer, str(CSV / "signatures.csv"))
    ownership.dispatch_proof_of_address_ownership()
    assert len(summa.address_ownership_proofs) == 2
    with pytest.raises(ValueError, match="already verified"):
        ownership.dispatch_proof_of_address_ownership()


def test_commitment_validation(summa, signer):
    cryptos = [Cryptocurrency("ETH", "ETH"), Cryptocurrency("USDT", "ETH")]
    signer.submit_commitment(GOLDEN_ROOT_16, [556862, 556862], cryptos, 1)
    assert summa.commitments[1].mst_root == GOLDEN_ROOT_16
    with pytest.raises(ValueError, match="mismatch"):
        signer.submit_commitment(1, [1], cryptos, 2)
    with pytest.raises(PermissionError):
        summa.submit_commitment("0xnotowner", 1, [1, 2], cryptos, 3)


def test_concurrent_commitments_nonce_lock(summa, signer):
    """The reference's race test (`backend/src/tests.rs:146-191`)."""
    cryptos = [Cryptocurrency("ETH", "ETH"), Cryptocurrency("USDT", "ETH")]
    threads = [
        threading.Thread(
            target=signer.submit_commitment,
            args=(GOLDEN_ROOT_16, [556862, 556862], cryptos, ts),
        )
        for ts in range(10)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(summa.commitments) == 10
    assert signer.nonce == 10


def test_address_input_resolution(tmp_path):
    literal = AddressInput(address="0xabc")
    assert literal.resolve() == "0xabc"
    path = tmp_path / "deployments.json"
    path.write_text(json.dumps({"31337": {"address": "0xdef", "name": "Summa"}}))
    by_chain = AddressInput(deployments_path=str(path), chain_id=31337)
    assert by_chain.resolve() == "0xdef"


def test_leaf_hash_from_inputs_matches_tree():
    tree = MerkleSumTree.from_csv(str(CSV / "entry_16.csv"))
    e = tree.entries[0]
    assert (
        leaf_hash_from_inputs(e.username, [str(b) for b in e.balances])
        == tree.leaves()[0].hash
    )


def test_inclusion_verification_root_checks(summa, signer):
    cryptos = [Cryptocurrency("ETH", "ETH"), Cryptocurrency("USDT", "ETH")]
    signer.submit_commitment(GOLDEN_ROOT_16, [556862, 556862], cryptos, 1)
    pub = [123, GOLDEN_ROOT_16, 556862, 556862]
    assert summa.verify_inclusion_proof(b"\x00", pub, 1)  # verifier stub True
    with pytest.raises(ValueError, match="Invalid root hash"):
        summa.verify_inclusion_proof(b"", [0, 999] + pub[2:], 1)
    with pytest.raises(ValueError, match="Invalid root balance"):
        summa.verify_inclusion_proof(b"", [0, GOLDEN_ROOT_16, 1, 2], 1)

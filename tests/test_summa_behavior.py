"""Summa registrar behavior parity — mirrors the reference hardhat suite
(`contracts/test/Summa.ts:127-528`, 20 cases), driven through the web3
JSON-RPC transport so the ABI/transaction layer is exercised too.

Every case runs against BOTH backends (fixture params):
  - ``sol``: the SHIPPED contracts/solidity/Summa.sol source, executed by
    the Solidity-subset interpreter (contracts/sol_exec.py) — the .sol
    file is the tested artifact, as in the reference's Anvil-backed suite;
  - ``sim``: the Python state-machine spec (contracts/summa_sim.py), kept
    as a cross-check of the interpreter.

Proof-verification cases with real ZK fixtures live in test_contracts.py /
test_backend.py."""

import pytest

from circuits_halo2_tpu.backend.web3_transport import (
    FakeRpcProvider,
    Web3SummaContract,
)
from circuits_halo2_tpu.contracts.summa_sim import (
    AddressOwnershipProof,
    Cryptocurrency,
    SummaContractSim,
)
from circuits_halo2_tpu.ops.keccak import keccak256

OWNER = "0xowner"
ADDR = "0x" + "22" * 20
CRYPTOS = [Cryptocurrency("ETH", "ETH"), Cryptocurrency("USDT", "ETH")]


def _proof(addr="0xCexAddress", chain="ETH", sig="0xsig", msg="Summa ownership"):
    return AddressOwnershipProof(addr, chain, sig, msg)


@pytest.fixture(params=["sol", "sim"])
def stack(request):
    if request.param == "sol":
        from circuits_halo2_tpu.contracts.sol_exec import SolSummaContract

        sim = SolSummaContract(lambda p, i: True, 4, 2, 8, owner=OWNER)
    else:
        sim = SummaContractSim(lambda p, i: True, 4, 2, 8, owner=OWNER)
    return sim, Web3SummaContract(FakeRpcProvider(sim, ADDR), ADDR)


# --- ownership (Summa.ts:127-214) ------------------------------------------

def test_ownership_stored_and_event(stack):
    sim, c = stack
    c.submit_proof_of_address_ownership(OWNER, [_proof()])
    assert sim.address_ownership_proofs[0].cex_address == "0xCexAddress"
    assert sim.events[-1][0] == "AddressOwnershipProofSubmitted"


def test_ownership_reverts_for_non_owner(stack):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_proof_of_address_ownership("0xmallory", [_proof()])


def test_ownership_rejects_duplicate_address(stack):
    sim, c = stack
    c.submit_proof_of_address_ownership(OWNER, [_proof()])
    # dedup key is the address ALONE (Summa.sol:116-120): a different chain
    # for the same address still reverts
    with pytest.raises(ValueError):
        c.submit_proof_of_address_ownership(OWNER, [_proof(chain="BTC")])


@pytest.mark.parametrize(
    "bad",
    [
        _proof(addr=""),
        _proof(chain=""),
        _proof(sig=""),
        _proof(msg=""),
    ],
)
def test_ownership_rejects_invalid_fields(stack, bad):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_proof_of_address_ownership(OWNER, [bad])


def test_ownership_lookup_unverified_reverts(stack):
    sim, c = stack
    c.submit_proof_of_address_ownership(OWNER, [_proof()])
    key = keccak256(b"0xCexAddress")
    assert sim.get_address_ownership_proof(key).chain == "ETH"
    with pytest.raises(ValueError, match="Address not verified"):
        sim.get_address_ownership_proof(keccak256(b"0xother"))


# --- commitments (Summa.ts:274-354) -----------------------------------------

def test_commitment_stored_and_event(stack):
    sim, c = stack
    c.submit_commitment(OWNER, 0x177B, [556862, 556862], CRYPTOS, 1)
    assert sim.commitments[1].mst_root == 0x177B
    assert sim.events[-1][0] == "LiabilitiesCommitmentSubmitted"


def test_commitment_reverts_for_non_owner(stack):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_commitment("0xmallory", 1, [1, 1], CRYPTOS, 1)


def test_commitment_rejects_zero_root(stack):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_commitment(OWNER, 0, [1, 1], CRYPTOS, 1)


def test_commitment_rejects_zero_root_sum(stack):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_commitment(OWNER, 0x177B, [1, 0], CRYPTOS, 1)


def test_commitment_rejects_invalid_cryptocurrency(stack):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_commitment(
            OWNER, 0x177B, [1, 1],
            [Cryptocurrency("", "ETH"), Cryptocurrency("USDT", "ETH")], 1,
        )


def test_commitment_rejects_count_mismatch(stack):
    _, c = stack
    with pytest.raises(ValueError):
        c.submit_commitment(OWNER, 0x177B, [1, 1, 1], CRYPTOS, 1)


# --- inclusion verification (Summa.ts:432-526) -------------------------------

def test_verify_inclusion_happy_path(stack):
    sim, c = stack
    c.submit_commitment(OWNER, 0x177B, [556862, 556862], CRYPTOS, 1)
    assert c.verify_inclusion_proof(b"\x01" * 64, [7, 0x177B, 556862, 556862], 1)


def test_verify_rejects_wrong_root(stack):
    sim, c = stack
    c.submit_commitment(OWNER, 0x177B, [556862, 556862], CRYPTOS, 1)
    with pytest.raises(Exception):
        c.verify_inclusion_proof(b"\x01", [7, 0xBAD, 556862, 556862], 1)


def test_verify_rejects_wrong_timestamp_lookup(stack):
    sim, c = stack
    c.submit_commitment(OWNER, 0x177B, [556862, 556862], CRYPTOS, 1)
    c.submit_commitment(OWNER, 0x200, [1, 1], CRYPTOS, 2)
    # proof targets timestamp 1's root; lookup at timestamp 2 must fail
    with pytest.raises(Exception):
        c.verify_inclusion_proof(b"\x01", [7, 0x177B, 556862, 556862], 2)


def test_verify_rejects_wrong_balances(stack):
    sim, c = stack
    c.submit_commitment(OWNER, 0x177B, [556862, 556862], CRYPTOS, 1)
    with pytest.raises(Exception):
        c.verify_inclusion_proof(b"\x01", [7, 0x177B, 1, 556862], 1)


def test_verifier_exception_reverts_with_message():
    def boom(proof, inputs):
        raise RuntimeError("malformed point")

    sim = SummaContractSim(boom, 4, 2, 8, owner=OWNER)
    sim.submit_commitment(OWNER, 0x177B, [1, 1], CRYPTOS, 1)
    with pytest.raises(ValueError, match="Invalid inclusion proof"):
        sim.verify_inclusion_proof(b"\x01", [7, 0x177B, 1, 1], 1)


def test_verifier_false_returns_false(stack):
    sim = SummaContractSim(lambda p, i: False, 4, 2, 8, owner=OWNER)
    sim.submit_commitment(OWNER, 0x177B, [1, 1], CRYPTOS, 1)
    assert sim.verify_inclusion_proof(b"\x01", [7, 0x177B, 1, 1], 1) is False

"""Proof pipeline wrappers — the L4 API surface.

Parity target: `zk_prover/src/circuits/utils.rs:37-203`
(generate_setup_artifacts / full_prover / full_verifier /
gen_proof_solidity_calldata / field_element_to_solidity_calldata).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from ..models.keygen import ProvingKey, VerifyingKey, keygen
from ..models.mst_inclusion import MstInclusionCircuit, compile_circuit
from ..models.prover import BlindingRng, prove
from ..models.verifier import verify
from ..utils.srs import ParamsKZG
from ..utils.transcript import Blake2bTranscript, KeccakTranscript


@dataclass
class SetupArtifacts:
    params: ParamsKZG
    pk: ProvingKey
    vk: VerifyingKey
    cs: object
    config: object
    circuit_shape: tuple  # (levels, n_currencies, n_bytes)


@dataclass
class ProofSolidityCallData:
    """EVM calldata bundle (`zk_prover/src/circuits/types.rs:4-9`)."""

    proof: str                 # 0x-prefixed hex
    public_inputs: list[str]   # 0x-prefixed U256 hex


@dataclass
class CommitmentSolidityCallData:
    """(`zk_prover/src/circuits/types.rs:11-14`)."""

    root_hash: str
    root_balances: list[str]


def generate_setup_artifacts(
    k: int,
    ptau_path: str | None,
    levels: int,
    n_currencies: int,
    n_bytes: int,
) -> SetupArtifacts:
    """Load (or unsafely generate) the SRS, downsize to k, and run keygen.

    Mirrors `circuits/utils.rs:37-79`: with a ptau path the params are read
    and downsized when larger than k; without one an unsafe deterministic
    test setup is generated (reference uses ``ParamsKZG::setup(k, OsRng)``).
    """
    if ptau_path is not None:
        params = ParamsKZG.read(ptau_path)
        if params.k < k:
            raise ValueError("provided ptau is smaller than the requested k")
        if params.k > k:
            params = params.downsize(k)
    else:
        params = ParamsKZG.setup(k)
    _, cs, config, asn = compile_circuit(levels, n_currencies, n_bytes, k)
    vk, pk = keygen(params, cs, asn)
    return SetupArtifacts(params, pk, vk, cs, config, (levels, n_currencies, n_bytes))


def generate_incremental_artifacts(
    k: int,
    ptau_path: str | None,
    levels: int,
    n_currencies: int,
    n_bytes: int,
) -> SetupArtifacts:
    """Setup + keygen for the incremental (IVC-step) inclusion circuit
    (`models/incremental.py`); same SRS handling as
    ``generate_setup_artifacts``."""
    from ..models.incremental import compile_incremental_circuit

    if ptau_path is not None:
        params = ParamsKZG.read(ptau_path)
        if params.k < k:
            raise ValueError("provided ptau is smaller than the requested k")
        if params.k > k:
            params = params.downsize(k)
    else:
        params = ParamsKZG.setup(k)
    _, cs, config, asn = compile_incremental_circuit(levels, n_currencies, n_bytes, k)
    vk, pk = keygen(params, cs, asn)
    return SetupArtifacts(params, pk, vk, cs, config, (levels, n_currencies, n_bytes))


def generate_chained_artifacts(
    k: int,
    ptau_path: str | None,
    levels: int,
    n_currencies: int,
    n_bytes: int,
    nsteps: int,
) -> SetupArtifacts:
    """Setup + keygen for the N-step chained (CompressedSNARK-equivalent)
    inclusion circuit (`models/incremental.ChainedMstInclusionCircuit`)."""
    from ..models.incremental import compile_chained_circuit

    if ptau_path is not None:
        params = ParamsKZG.read(ptau_path)
        if params.k < k:
            raise ValueError("provided ptau is smaller than the requested k")
        if params.k > k:
            params = params.downsize(k)
    else:
        params = ParamsKZG.setup(k)
    _, cs, config, asn = compile_chained_circuit(
        levels, n_currencies, n_bytes, nsteps, k
    )
    vk, pk = keygen(params, cs, asn)
    return SetupArtifacts(params, pk, vk, cs, config, (levels, n_currencies, n_bytes))


def full_prover(
    artifacts: SetupArtifacts,
    circuit: MstInclusionCircuit,
    instances: list[list[int]],
    rng: BlindingRng | None = None,
) -> bytes:
    """Native-path proof (Blake2b transcript, compressed points) —
    `circuits/utils.rs:82-107`."""
    return prove(
        artifacts.params,
        artifacts.pk,
        circuit,
        artifacts.config,
        instances,
        rng=rng,
        transcript_cls=Blake2bTranscript,
    )


def full_verifier(
    artifacts: SetupArtifacts,
    proof: bytes,
    instances: list[list[int]],
) -> bool:
    """`circuits/utils.rs:110-131`."""
    try:
        return verify(
            artifacts.params,
            artifacts.vk,
            instances,
            proof,
            transcript_cls=Blake2bTranscript,
        )
    except (ValueError, AssertionError, KeyError):
        return False


def gen_proof_solidity_calldata(
    artifacts: SetupArtifacts,
    circuit: MstInclusionCircuit,
    rng: BlindingRng | None = None,
    vk_digest: int | None = None,
) -> ProofSolidityCallData:
    """EVM-path proof (Keccak transcript, uncompressed points), self-checked
    before export — `circuits/utils.rs:134-196`."""
    instances = circuit.instances()
    proof = prove(
        artifacts.params,
        artifacts.pk,
        circuit,
        artifacts.config,
        instances,
        rng=rng,
        transcript_cls=KeccakTranscript,
        vk_digest=vk_digest,
    )
    ok = verify(
        artifacts.params,
        artifacts.vk,
        instances,
        proof,
        transcript_cls=KeccakTranscript,
        vk_digest=vk_digest,
    )
    assert ok, "proof verification failed before calldata export"
    return ProofSolidityCallData(
        proof="0x" + proof.hex(),
        public_inputs=[field_element_to_solidity_calldata(v) for v in instances[0]],
    )


def field_element_to_solidity_calldata(value: int) -> str:
    """`circuits/utils.rs:199-203` — U256 hex (minimal length, 0x-prefixed)."""
    return hex(value)


def calculate_max_root_balance(n_bytes: int, n_levels: int) -> int:
    """Max value the Merkle root balance can reach
    (`zk_prover/examples/gen_inclusion_verifier.rs:55-60`)."""
    return ((1 << (8 * n_bytes)) - 1) * (n_levels + 1)


def is_there_risk_of_overflow(n_bytes: int, n_levels: int) -> bool:
    """Root-balance overflow guard (`gen_inclusion_verifier.rs:63-72`)."""
    from ..ops.field import FR_MOD

    return calculate_max_root_balance(n_bytes, n_levels) > FR_MOD

"""Incremental (IVC-style) inclusion — the TPU-native equivalent of the
reference's experimental Nova side-module.

The reference folds per-round inclusion steps with Nova over a circom
circuit (`zk_prover/examples/nova_incremental_verifier.rs:23-226`,
`zk_prover/src/circom/incremental_mst_inclusion.circom:36-77`): each step
takes ``step_in = [user_state_prev, liabilities_state_prev]``, proves MST
inclusion for the round, and outputs

    user_state_cur        = H(user_state_prev, leaf_hash)
    liabilities_state_cur = H(liabilities_state_prev, root_hash)

Here the same statement is expressed in the framework's PLONKish IR and
proved per step with the full KZG+SHPLONK pipeline; steps chain by public-
input equality (state_out_i == state_in_{i+1}), giving a verifiable chain
over all rounds. Divergence from the reference (by design, documented):
Nova's folding compresses the chain into one proof, while here each step is
an independently verifiable SNARK — the chain check is N instance
comparisons. Hashes use the framework's halo2 Poseidon; the bit-compatible
circom witness chain (circom Poseidon, `;`-CSV) lives in
``merkle/circom_mst.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..merkle.mst import Cryptocurrency, Entry, MerkleProof, MerkleSumTree
from ..merkle.circom_mst import parse_states_csv
from ..ops.field import FR_MOD
from ..ops import poseidon
from .assignment import Assignment
from .cs import ConstraintSystem
from .mst_inclusion import MstInclusionCircuit, MstInclusionConfig


class IncrementalMstInclusionCircuit(MstInclusionCircuit):
    """One IVC step: MST inclusion + the two state-chain hashes.

    Public instances (one column, 4 rows):
        [user_state_prev, liabilities_state_prev,
         user_state_cur,  liabilities_state_cur]
    (circom exposes the same four values via ``step_in``/``step_out``,
    `incremental_mst_inclusion.circom:37-46`.)
    """

    def __init__(self, levels: int, n_currencies: int, n_bytes: int):
        super().__init__(levels, n_currencies, n_bytes)
        self.user_state_prev = 0
        self.liab_state_prev = 0

    @classmethod
    def init_step(
        cls,
        levels: int,
        n_currencies: int,
        n_bytes: int,
        proof: MerkleProof,
        user_state_prev: int,
        liab_state_prev: int,
    ) -> "IncrementalMstInclusionCircuit":
        c = cls.init(levels, n_currencies, n_bytes, proof)
        c.user_state_prev = user_state_prev % FR_MOD
        c.liab_state_prev = liab_state_prev % FR_MOD
        return c

    # -- public inputs ------------------------------------------------------

    def num_instances(self) -> int:
        return 4

    def leaf_hash(self) -> int:
        return poseidon.hash_n([self.entry_username] + self.entry_balances)

    def instances(self) -> list[list[int]]:
        user_cur = poseidon.hash_n([self.user_state_prev, self.leaf_hash()])
        liab_cur = poseidon.hash_n([self.liab_state_prev, self.root_hash])
        return [[self.user_state_prev, self.liab_state_prev, user_cur, liab_cur]]

    # -- synthesize ---------------------------------------------------------

    def synthesize(self, config: MstInclusionConfig, asn: Assignment):
        entry_chip_cfg = config.poseidon_entry
        from . import pow5

        entry_chip = pow5.Pow5Chip(entry_chip_cfg)
        middle_chip = pow5.Pow5Chip(config.poseidon_middle)
        merkle_chip = config.merkle_chip
        range_chip = config.range_chip
        ncur = self.n_currencies

        user_state_prev = self._assign_value(
            asn, self.user_state_prev, "user state prev", config.advices[0]
        )
        liab_state_prev = self._assign_value(
            asn, self.liab_state_prev, "liabilities state prev", config.advices[0]
        )
        asn.constrain_instance(user_state_prev, config.instance, 0)
        asn.constrain_instance(liab_state_prev, config.instance, 1)

        username = self._assign_value(
            asn, self.entry_username, "entry username", config.advices[0]
        )
        current_balances = [
            self._assign_value(asn, b, "entry balance", config.advices[1])
            for b in self.entry_balances
        ]
        current_hash = entry_chip.hash(asn, [username] + current_balances)

        # user_state_cur = H(user_state_prev, leaf_hash)
        user_state_cur = entry_chip.hash(asn, [user_state_prev, current_hash])
        asn.constrain_instance(user_state_cur, config.instance, 2)

        self._load_u8_table(asn, config.fixed_columns[4])

        for level in range(self.levels):
            sibling_balances = []
            if level == 0:
                sibling_username = self._assign_value(
                    asn,
                    self.sibling_leaf_node_hash_preimage[0],
                    "sibling leaf node username",
                    config.advices[0],
                )
                for currency in range(ncur):
                    sibling_balances.append(
                        self._assign_value(
                            asn,
                            self.sibling_leaf_node_hash_preimage[currency + 1],
                            "sibling leaf balance",
                            config.advices[1],
                        )
                    )
                sibling_hash = entry_chip.hash(
                    asn, [sibling_username] + sibling_balances
                )
                for currency in range(ncur):
                    range_chip.assign(asn, current_balances[currency])
                    range_chip.assign(asn, sibling_balances[currency])
            else:
                preimage = self.sibling_middle_node_hash_preimages[level - 1]
                for currency in range(ncur):
                    sibling_balances.append(
                        self._assign_value(
                            asn,
                            preimage[currency],
                            "sibling node balance",
                            config.advices[1],
                        )
                    )
                left_hash = self._assign_value(
                    asn, preimage[ncur], "sibling left hash", config.advices[2]
                )
                right_hash = self._assign_value(
                    asn, preimage[ncur + 1], "sibling right hash", config.advices[2]
                )
                sibling_hash = middle_chip.hash(
                    asn, sibling_balances + [left_hash, right_hash]
                )
                for currency in range(ncur):
                    range_chip.assign(asn, sibling_balances[currency])

            swap_bit = self._assign_value(
                asn, self.path_indices[level], "swap bit", config.advices[0]
            )
            hash_left, hash_right = merkle_chip.swap_hashes_per_level(
                asn, current_hash, sibling_hash, swap_bit
            )
            next_balances = []
            for currency in range(ncur):
                next_balances.append(
                    merkle_chip.sum_balances_per_level(
                        asn, current_balances[currency], sibling_balances[currency]
                    )
                )
            current_hash = middle_chip.hash(
                asn, next_balances + [hash_left, hash_right]
            )
            current_balances = next_balances

        # liabilities_state_cur = H(liabilities_state_prev, root_hash)
        liab_state_cur = entry_chip.hash(asn, [liab_state_prev, current_hash])
        asn.constrain_instance(liab_state_cur, config.instance, 3)


class ChainedMstInclusionCircuit(IncrementalMstInclusionCircuit):
    """N IVC steps compressed into ONE SNARK — the CompressedSNARK-
    equivalent endpoint of the incremental chain.

    The reference folds N step instances with Nova and then produces one
    Spartan proof whose verification cost is independent of N
    (`nova_incremental_verifier.rs:199-226`). Here the same N-step chain
    STATEMENT — user_state_{i+1} = H(user_state_i, leaf_hash_i),
    liab_state_{i+1} = H(liab_state_i, root_hash_i), with every step's
    full MST inclusion + range checks — is proven inside one PLONKish
    circuit: the state cells chain across steps by direct cell reuse (a
    copy-constraint chain), so the proof artifact is ONE KZG+SHPLONK proof
    and verification is one transcript replay + one pairing, independent
    of N. Public instances (4 rows, the ``step_in``/``z_last`` shape):
    [user_state_0, liab_state_0, user_state_N, liab_state_N].

    Honest divergence from Nova, documented: proving COST is O(N) rows in
    one circuit (N bounded by 2^k), not O(1)-memory folding; verify cost
    and artifact size are O(1) like the reference's compressed proof.
    """

    def __init__(self, levels: int, n_currencies: int, n_bytes: int,
                 nsteps: int):
        super().__init__(levels, n_currencies, n_bytes)
        self.nsteps = nsteps
        self.step_witnesses: list[IncrementalMstInclusionCircuit] = [
            IncrementalMstInclusionCircuit(levels, n_currencies, n_bytes)
            for _ in range(nsteps)
        ]

    @classmethod
    def init_chain(cls, levels: int, n_currencies: int, n_bytes: int,
                   proofs: list[MerkleProof]) -> "ChainedMstInclusionCircuit":
        c = cls(levels, n_currencies, n_bytes, len(proofs))
        us, ls = 0, 0
        for i, mp in enumerate(proofs):
            step = IncrementalMstInclusionCircuit.init_step(
                levels, n_currencies, n_bytes, mp, us, ls
            )
            c.step_witnesses[i] = step
            inst = step.instances()[0]
            us, ls = inst[2], inst[3]
        c.final_user_state = us
        c.final_liab_state = ls
        return c

    # -- public inputs ------------------------------------------------------

    def num_instances(self) -> int:
        return 4

    def instances(self) -> list[list[int]]:
        us, ls = 0, 0
        for step in self.step_witnesses:
            inst = step.instances()[0]
            if inst[0] != us or inst[1] != ls:
                raise ValueError("step witnesses are not a valid chain")
            us, ls = inst[2], inst[3]
        return [[0, 0, us, ls]]

    # -- synthesize ---------------------------------------------------------

    def synthesize(self, config: MstInclusionConfig, asn: Assignment):
        from . import pow5

        entry_chip = pow5.Pow5Chip(config.poseidon_entry)
        middle_chip = pow5.Pow5Chip(config.poseidon_middle)
        merkle_chip = config.merkle_chip
        range_chip = config.range_chip
        ncur = self.n_currencies

        user_state = self._assign_value(
            asn, 0, "user state 0", config.advices[0]
        )
        liab_state = self._assign_value(
            asn, 0, "liabilities state 0", config.advices[0]
        )
        asn.constrain_instance(user_state, config.instance, 0)
        asn.constrain_instance(liab_state, config.instance, 1)

        self._load_u8_table(asn, config.fixed_columns[4])  # shared by all steps

        for w in self.step_witnesses:
            username = self._assign_value(
                asn, w.entry_username, "entry username", config.advices[0]
            )
            current_balances = [
                self._assign_value(asn, b, "entry balance", config.advices[1])
                for b in w.entry_balances
            ]
            current_hash = entry_chip.hash(asn, [username] + current_balances)
            # user_state chain: the PREVIOUS step's output cell feeds the
            # sponge directly (cell reuse = copy-constraint chaining)
            user_state = entry_chip.hash(asn, [user_state, current_hash])

            for level in range(w.levels):
                sibling_balances = []
                if level == 0:
                    sibling_username = self._assign_value(
                        asn,
                        w.sibling_leaf_node_hash_preimage[0],
                        "sibling leaf node username",
                        config.advices[0],
                    )
                    for currency in range(ncur):
                        sibling_balances.append(
                            self._assign_value(
                                asn,
                                w.sibling_leaf_node_hash_preimage[currency + 1],
                                "sibling leaf balance",
                                config.advices[1],
                            )
                        )
                    sibling_hash = entry_chip.hash(
                        asn, [sibling_username] + sibling_balances
                    )
                    for currency in range(ncur):
                        range_chip.assign(asn, current_balances[currency])
                        range_chip.assign(asn, sibling_balances[currency])
                else:
                    preimage = w.sibling_middle_node_hash_preimages[level - 1]
                    for currency in range(ncur):
                        sibling_balances.append(
                            self._assign_value(
                                asn,
                                preimage[currency],
                                "sibling node balance",
                                config.advices[1],
                            )
                        )
                    left_hash = self._assign_value(
                        asn, preimage[ncur], "sibling left hash",
                        config.advices[2],
                    )
                    right_hash = self._assign_value(
                        asn, preimage[ncur + 1], "sibling right hash",
                        config.advices[2],
                    )
                    sibling_hash = middle_chip.hash(
                        asn, sibling_balances + [left_hash, right_hash]
                    )
                    for currency in range(ncur):
                        range_chip.assign(asn, sibling_balances[currency])

                swap_bit = self._assign_value(
                    asn, w.path_indices[level], "swap bit", config.advices[0]
                )
                hash_left, hash_right = merkle_chip.swap_hashes_per_level(
                    asn, current_hash, sibling_hash, swap_bit
                )
                next_balances = []
                for currency in range(ncur):
                    next_balances.append(
                        merkle_chip.sum_balances_per_level(
                            asn, current_balances[currency],
                            sibling_balances[currency],
                        )
                    )
                current_hash = middle_chip.hash(
                    asn, next_balances + [hash_left, hash_right]
                )
                current_balances = next_balances

            # liabilities chain on this step's root
            liab_state = entry_chip.hash(asn, [liab_state, current_hash])

        asn.constrain_instance(user_state, config.instance, 2)
        asn.constrain_instance(liab_state, config.instance, 3)


def compile_chained_circuit(levels: int, n_currencies: int, n_bytes: int,
                            nsteps: int, k: int):
    """configure + keygen-style synthesis for the N-step chained circuit."""
    n = 1 << k
    circuit = ChainedMstInclusionCircuit(levels, n_currencies, n_bytes, nsteps)
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    asn = Assignment(cs, n, [[0] * circuit.num_instances()])
    circuit.synthesize(config, asn)
    new_cols, new_values = cs.compress_selectors(
        [list(act) for act in asn.selectors], n
    )
    for values in new_values:
        asn.fixed.append(list(values))
    return circuit, cs, config, asn


def prove_chain_snark(artifacts, csv_paths: list[str], user_index: int):
    """ONE compressed SNARK for the whole N-round chain.

    ``artifacts`` must come from
    ``pipeline.generate_chained_artifacts(k, ..., nsteps=len(csv_paths))``.
    Returns ``(proof_bytes, instances)`` — the CompressedSNARK analogue:
    constant-size artifact, constant-cost verification."""
    from ..utils import pipeline

    levels, ncur, nbytes = artifacts.circuit_shape
    cryptos = [Cryptocurrency(f"CUR{i}", "NA") for i in range(ncur)]
    proofs = []
    for path in csv_paths:
        tree = MerkleSumTree.from_entries(entries_from_states_csv(path), cryptos)
        proofs.append(tree.generate_proof(user_index))
    circuit = ChainedMstInclusionCircuit.init_chain(levels, ncur, nbytes, proofs)
    inst = circuit.instances()
    proof = pipeline.full_prover(artifacts, circuit, inst)
    return proof, inst


def verify_chain_snark(artifacts, proof: bytes, instances,
                       expected_roots: list[int] | None = None,
                       expected_leaf_hashes: list[int] | None = None) -> bool:
    """Verify the compressed chain SNARK — one transcript replay + one
    pairing, independent of N (the CompressedSNARK::verify equivalent).

    When the published per-round roots (and optionally the user's leaf
    hashes) are supplied, the final chain states are recomputed from them
    — the ``z_last`` check of `nova_incremental_verifier.rs:199-226` —
    binding the SNARK to the on-chain commitments."""
    from ..ops import poseidon
    from ..utils import pipeline

    inst = instances[0]
    if inst[0] != 0 or inst[1] != 0:
        return False
    if expected_roots is not None:
        ls = 0
        for r in expected_roots:
            ls = poseidon.hash_n([ls, r])
        if ls != inst[3]:
            return False
    if expected_leaf_hashes is not None:
        us = 0
        for lh in expected_leaf_hashes:
            us = poseidon.hash_n([us, lh])
        if us != inst[2]:
            return False
    return pipeline.full_verifier(artifacts, proof, instances)


def compile_incremental_circuit(levels: int, n_currencies: int, n_bytes: int, k: int):
    """configure + keygen-style synthesis for the empty step circuit."""
    n = 1 << k
    circuit = IncrementalMstInclusionCircuit(levels, n_currencies, n_bytes)
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    asn = Assignment(cs, n, [[0] * circuit.num_instances()])
    circuit.synthesize(config, asn)
    new_cols, new_values = cs.compress_selectors(
        [list(act) for act in asn.selectors], n
    )
    for values in new_values:
        asn.fixed.append(list(values))
    return circuit, cs, config, asn


# ---------------------------------------------------------------------------
# Chain driver (the create_recursive_circuit / verify equivalent)
# ---------------------------------------------------------------------------


@dataclass
class IncrementalStep:
    proof: bytes
    instances: list[list[int]]


@dataclass
class IncrementalChainProof:
    """Per-round step proofs + the state trajectories.

    ``user_states[-1]`` / ``liab_states[-1]`` are what the reference's
    recursive SNARK outputs as ``z_last`` (`nova_incremental_verifier.rs:156`).
    """

    steps: list[IncrementalStep]
    user_states: list[int]
    liab_states: list[int]


def entries_from_states_csv(path: str) -> list[Entry]:
    """`;`-format round CSV → halo2-MST entries (keccak usernames)."""
    return [Entry(u, b) for u, b in parse_states_csv(path)]


def prove_chain(artifacts, csv_paths: list[str], user_index: int) -> IncrementalChainProof:
    """Prove inclusion of one user across every round, chaining states.

    ``artifacts`` must come from ``pipeline.generate_incremental_artifacts``
    (the step circuit's keygen).
    """
    from ..utils import pipeline

    levels, ncur, nbytes = artifacts.circuit_shape
    user_states = [0]
    liab_states = [0]
    steps = []
    cryptos = [Cryptocurrency(f"CUR{i}", "NA") for i in range(ncur)]
    for path in csv_paths:
        tree = MerkleSumTree.from_entries(entries_from_states_csv(path), cryptos)
        mp = tree.generate_proof(user_index)
        circuit = IncrementalMstInclusionCircuit.init_step(
            levels, ncur, nbytes, mp, user_states[-1], liab_states[-1]
        )
        inst = circuit.instances()
        proof = pipeline.full_prover(artifacts, circuit, inst)
        steps.append(IncrementalStep(proof, inst))
        user_states.append(inst[0][2])
        liab_states.append(inst[0][3])
    return IncrementalChainProof(steps, user_states, liab_states)


def verify_chain(artifacts, chain: IncrementalChainProof) -> bool:
    """Verify every step proof and the state chaining between steps
    (the RecursiveSNARK::verify equivalent). One pairing per step; see
    ``verify_chain_compressed`` for the batched single-pairing check."""
    from ..utils import pipeline

    prev_user, prev_liab = 0, 0
    for step in chain.steps:
        inst = step.instances[0]
        if inst[0] != prev_user or inst[1] != prev_liab:
            return False
        if not pipeline.full_verifier(artifacts, step.proof, step.instances):
            return False
        prev_user, prev_liab = inst[2], inst[3]
    return (
        prev_user == chain.user_states[-1] and prev_liab == chain.liab_states[-1]
    )


def verify_chain_compressed(artifacts, chain: IncrementalChainProof) -> bool:
    """Chain verification with ONE pairing check, independent of the number
    of rounds — the compression analogue of the reference's CompressedSNARK
    step (`nova_incremental_verifier.rs:199-226`).

    Every step's transcript is replayed (cheap host hashing) to produce a
    KZG accumulator pair (acc_i, w'_i) satisfying
    e(acc_i, G2) == e(w'_i, s·G2) iff step i is valid. The pairs are
    combined with Fiat–Shamir randomizers r_i (Blake2b over all proofs and
    instances, so a prover cannot choose proofs after seeing r):

        e(Σ r_i·acc_i, G2) == e(Σ r_i·w'_i, s·G2)

    which by bilinearity + Schwartz–Zippel holds for random r iff every
    individual equation holds. Divergence from the reference, documented:
    Nova folding also compresses proof SIZE to O(1); here the chain proof
    stays O(N) bytes while the dominant verification cost (the pairing)
    becomes O(1).
    """
    import hashlib

    from ..models.verifier import verify as _verify
    from ..ops import curve as C
    from ..ops import pairing as PAIR
    from ..utils.transcript import Blake2bTranscript

    params, vk = artifacts.params, artifacts.vk

    # Fiat–Shamir randomizers bound to the whole chain
    h = hashlib.blake2b(b"circuits-halo2-tpu-chain-batch")
    for step in chain.steps:
        h.update(step.proof)
        for col in step.instances:
            for v in col:
                h.update(int(v).to_bytes(32, "little"))
    seed = h.digest()

    prev_user, prev_liab = 0, 0
    acc_total, wp_total = None, None
    for i, step in enumerate(chain.steps):
        inst = step.instances[0]
        if inst[0] != prev_user or inst[1] != prev_liab:
            return False
        try:
            ok, pair = _verify(
                params, vk, step.instances, step.proof,
                transcript_cls=Blake2bTranscript, defer_pairing=True,
            )
        except (ValueError, AssertionError, KeyError):
            return False
        if not ok:
            return False
        r = int.from_bytes(
            hashlib.blake2b(seed + i.to_bytes(8, "little")).digest(), "little"
        ) % FR_MOD
        acc_i, wp_i = pair
        acc_total = C.g1_add(acc_total, C.g1_mul(acc_i, r))
        wp_total = C.g1_add(wp_total, C.g1_mul(wp_i, r))
        prev_user, prev_liab = inst[2], inst[3]
    if prev_user != chain.user_states[-1] or prev_liab != chain.liab_states[-1]:
        return False
    return PAIR.pairing_check(
        [(acc_total, params.g2), (C.g1_neg(wp_total), params.s_g2)]
    )

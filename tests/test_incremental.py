"""Incremental (IVC-style) inclusion — circom-side witness parity and the
TPU-native PLONK step-proof chain.

Reference behavior: `zk_prover/examples/nova_incremental_verifier.rs` +
`zk_prover/src/circom/incremental_mst_inclusion.circom` (SURVEY §2a #21-22).
"""

import os
from pathlib import Path

import pytest

from circuits_halo2_tpu.merkle import circom_mst as CM
from circuits_halo2_tpu.merkle import circom_r1cs as R
from circuits_halo2_tpu.ops import poseidon_circom as PC

HERE = Path(__file__).parent
STATES = [str(HERE / "fixtures_csv" / "states" / f"entry_16_{i}.csv") for i in (1, 2, 3)]


def test_circom_poseidon_known_vectors():
    # canonical circomlib test vectors (circomlibjs test suite)
    assert PC.hash_n([1, 2]) == int(
        "7853200120776062878684798364095072458815029376092732009249414926327459813530"
    )
    assert PC.hash_n([1, 2, 3, 4]) == int(
        "18821383157269793795438455681495246036402687001665670618754263018637548127333"
    )


def test_circom_mst_proof_roundtrip():
    proof = CM.build_merkle_proof(STATES[0], 0)
    assert len(proof.path_indices) == 4  # 16 leaves -> 4 levels
    assert CM.verify_merkle_proof(proof)
    # root balances are the column totals
    entries = CM.parse_states_csv(STATES[0])
    totals = [sum(b[i] for _, b in entries) for i in range(2)]
    assert proof.root.balances == totals
    # tamper: wrong user index witness fails against original root
    bad = CM.build_merkle_proof(STATES[0], 1)
    bad.root = proof.root
    assert (
        CM.verify_merkle_proof(bad)
        == (CM.build_merkle_proof(STATES[0], 1).root.hash == proof.root.hash)
    )


def test_state_chain_structure():
    proofs, user_states, liab_states = CM.state_chain(STATES, 0)
    assert len(proofs) == 3 and len(user_states) == 4 and len(liab_states) == 4
    assert user_states[0] == 0 and liab_states[0] == 0
    # chain recomputes step by step
    us = 0
    ls = 0
    for p in proofs:
        us = CM.user_state_next(us, p.username, p.user_balances)
        ls = CM.liabilities_state_next(ls, p.root.hash)
    assert us == user_states[-1]
    assert ls == liab_states[-1]
    # same user, different rounds => different states
    assert len(set(user_states)) == 4


def test_incremental_circuit_mock():
    """Step circuit satisfiability + wrong-state negative via MockProver."""
    from circuits_halo2_tpu.merkle.mst import MerkleSumTree, Cryptocurrency
    from circuits_halo2_tpu.models.incremental import (
        IncrementalMstInclusionCircuit,
        entries_from_states_csv,
    )
    from circuits_halo2_tpu.models.mock_prover import MockProver

    cryptos = [Cryptocurrency("ETH", "ETH"), Cryptocurrency("BTC", "BTC")]
    tree = MerkleSumTree.from_entries(entries_from_states_csv(STATES[0]), cryptos)
    mp = tree.generate_proof(0)
    circ = IncrementalMstInclusionCircuit.init_step(4, 2, 8, mp, 7, 9)
    inst = circ.instances()
    assert MockProver(11, circ, inst).verify() == []

    # corrupt the claimed user_state_cur -> exact instance failure
    bad = [list(inst[0])]
    bad[0][2] = (bad[0][2] + 1) % (1 << 64)
    failures = MockProver(11, circ, bad).verify()
    assert failures, "tampered state must fail"


@pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="full 3-round chain proving (~3 min); run with CIRCUITS_TPU_SLOW=1",
)
def test_incremental_chain_prove_verify():
    from circuits_halo2_tpu.models import incremental as INC
    from circuits_halo2_tpu.utils import pipeline

    art = pipeline.generate_incremental_artifacts(
        11, str(HERE / "fixtures_ptau_hermez-raw-11"), 4, 2, 8
    )
    chain = INC.prove_chain(art, STATES, 0)
    assert INC.verify_chain(art, chain)
    # compressed verification: ONE pairing for the whole chain
    assert INC.verify_chain_compressed(art, chain)
    # corrupted proof bytes rejected by the batched pairing
    import copy

    bad = copy.deepcopy(chain)
    bad.steps[1] = INC.IncrementalStep(
        bad.steps[1].proof[:100] + bytes([bad.steps[1].proof[100] ^ 1])
        + bad.steps[1].proof[101:],
        bad.steps[1].instances,
    )
    assert not INC.verify_chain_compressed(art, bad)
    # broken chaining rejected
    chain.steps[1].instances[0][0] ^= 1
    assert not INC.verify_chain(art, chain)
    assert not INC.verify_chain_compressed(art, chain)


@pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="k=13 chained-circuit prove (~minutes); run with CIRCUITS_TPU_SLOW=1",
)
def test_chain_snark_constant_verify():
    """Compressed chain SNARK (VERDICT r2 #6): the whole 3-round chain in
    ONE proof — verify cost (one transcript replay + one pairing) and
    artifact size independent of N, the CompressedSNARK equivalent
    (`nova_incremental_verifier.rs:199-226`)."""
    from circuits_halo2_tpu.merkle.mst import MerkleSumTree
    from circuits_halo2_tpu.models import incremental as INC
    from circuits_halo2_tpu.merkle.mst import Cryptocurrency
    from circuits_halo2_tpu.ops import poseidon
    from circuits_halo2_tpu.utils import pipeline

    art = pipeline.generate_chained_artifacts(13, None, 4, 2, 8, nsteps=3)
    proof, inst = INC.prove_chain_snark(art, STATES, 0)

    # expected final states recomputed from the published roots/leaves
    cryptos = [Cryptocurrency(f"CUR{i}", "NA") for i in range(2)]
    roots, leaves = [], []
    for path in STATES:
        tree = MerkleSumTree.from_entries(
            INC.entries_from_states_csv(path), cryptos
        )
        roots.append(tree.root.hash)
        e = tree.get_entry(0)
        leaves.append(poseidon.hash_n([e.hashed_username] + list(e.balances)))

    assert INC.verify_chain_snark(art, proof, inst, expected_roots=roots,
                                  expected_leaf_hashes=leaves)
    # a single standard-size proof: constant artifact, not O(N)
    # (1632 B = the Blake2b/native-transcript proof size, same as one
    # single-step proof — vs O(N) step proofs in the uncompressed chain)
    assert len(proof) == 1632
    # wrong final state (root list truncated) rejected
    assert not INC.verify_chain_snark(art, proof, inst,
                                      expected_roots=roots[:2])
    # corrupted proof rejected
    bad = proof[:200] + bytes([proof[200] ^ 1]) + proof[201:]
    assert not INC.verify_chain_snark(art, bad, inst, expected_roots=roots)


def test_r1cs_step_circuit_satisfied():
    """The synthesized IncrementalMstInclusion R1CS (circom artifact
    equivalent, `incremental_mst_inclusion.circom` main = (4, 2, 14)) is
    satisfied by the evaluated witness, its public wires match the state
    chain, and corrupting any region of the witness breaks a constraint."""
    from circuits_halo2_tpu.merkle import circom_r1cs as R

    proof = CM.build_merkle_proof(STATES[0], 0)
    r1cs, wit = R.build_incremental_mst_inclusion(proof, (0, 0))
    assert r1cs.check(wit)
    # public outputs = the IVC step results
    assert wit[1] == CM.user_state_next(0, proof.username, proof.user_balances)
    assert wit[2] == CM.liabilities_state_next(0, proof.root.hash)
    assert wit[3] == 0 and wit[4] == 0  # step_in
    # template accounting: 7 Poseidons (leaf t=4, 2 state t=3, 4 hasher t=7),
    # 4 levels x (2 currencies x 2 sides + root) Num2Bits(112), 4 swappers
    n_sbox = lambda t: 3 * (8 * t + R.PC.N_ROUNDS_P[t - 2])
    poseidon_c = n_sbox(4) + 2 * n_sbox(3) + 4 * n_sbox(7)
    bits_c = (4 * 2 * 2 + 2) * (112 + 1)
    swap_c = 4 * (1 + 2 + 2 * 2)
    assert len(r1cs.constraints) == poseidon_c + bits_c + swap_c + 2
    # corrupt a path index -> booleanity/mux breaks
    bad = list(wit)
    bad[5 + 2 + 4 + 8] ^= 1  # first path_indices wire
    assert not r1cs.check(bad)
    # corrupt an internal S-box wire -> poseidon breaks
    bad2 = list(wit)
    bad2[len(wit) // 2] = (bad2[len(wit) // 2] + 1) % R.P
    assert not r1cs.check(bad2)


def test_r1cs_wtns_binary_roundtrip(tmp_path):
    """.r1cs / .wtns artifacts in the iden3 binary layout parse back to the
    identical system and still verify (snarkjs-interoperable shapes)."""
    from circuits_halo2_tpu.merkle import circom_r1cs as R

    proof = CM.build_merkle_proof(STATES[1], 2)
    si = (123456789, 987654321)
    r1cs, wit = R.build_incremental_mst_inclusion(proof, si)
    rp, wp = str(tmp_path / "step.r1cs"), str(tmp_path / "step.wtns")
    R.write_r1cs(r1cs, rp)
    R.write_wtns(wit, wp)
    r2, w2 = R.read_r1cs(rp), R.read_wtns(wp)
    assert (r2.n_wires, r2.n_pub_out, r2.n_pub_in, r2.n_prv_in) == (
        r1cs.n_wires, 2, 2, 19,
    )
    assert r2.constraints == r1cs.constraints
    assert w2 == wit
    assert r2.check(w2)


def _toy_r1cs():
    """out = x^3 + x over wires [1, out, x, x2, x3] (pub out, pub in)."""
    from circuits_halo2_tpu.merkle.circom_r1cs import R1CS

    cons = [
        ({2: 1}, {2: 1}, {3: 1}),              # x*x = x2
        ({3: 1}, {2: 1}, {4: 1}),              # x2*x = x3
        ({4: 1, 2: 1, 1: R.P - 1}, {0: 1}, {}),  # x3 + x - out = 0
    ]
    return R1CS(5, 1, 1, 0, cons)


def _toy_witness(x):
    return [1, (x**3 + x) % R.P, x, x * x % R.P, x**3 % R.P]


def test_nova_nifs_fold_chain():
    """NIFS over relaxed R1CS: fold N strict instances into one
    accumulator; verify = N O(1) instance folds + one relaxed-SAT check."""
    from circuits_halo2_tpu.models import nova_fold as NF

    r1cs = _toy_r1cs()
    bases = NF.pedersen_bases(max(5, len(r1cs.constraints)))
    # genuinely chained IVC trace: x_{i+1} = out_i = x_i^3 + x_i
    xs = [3]
    for _ in range(2):
        xs.append((xs[-1] ** 3 + xs[-1]) % R.P)
    wits = [_toy_witness(x) for x in xs]
    for w in wits:
        assert r1cs.check(w)
    z0, zn = [xs[0]], [(xs[-1] ** 3 + xs[-1]) % R.P]
    acc_i, acc_w, steps = NF.fold_chain(r1cs, wits, bases)
    # the folded accumulator is NOT a strict witness (E != 0) ...
    assert any(acc_w.e) and acc_i.u != 1
    # ... but satisfies the relaxed relation and the verifier accepts
    assert NF.relaxed_check(r1cs, acc_i, acc_w, bases)
    assert NF.verify_chain(r1cs, steps, acc_i, acc_w, bases, z0=z0, zn=zn)
    # tampered accumulator witness -> reject
    bad_w = NF.RelaxedWitness(list(acc_w.w), list(acc_w.e))
    bad_w.e[0] = (bad_w.e[0] + 1) % R.P
    assert not NF.verify_chain(r1cs, steps, acc_i, bad_w, bases)
    # tampered cross-term commitment -> challenge shifts -> reject
    bad_steps = list(steps)
    si, _ = bad_steps[1]
    bad_steps[1] = (si, NF.C.G1_GEN)
    assert not NF.verify_chain(r1cs, bad_steps, acc_i, acc_w, bases)
    # wrong claimed endpoints -> reject
    assert not NF.verify_chain(r1cs, steps, acc_i, acc_w, bases,
                               z0=[xs[0] + 1], zn=zn)
    assert not NF.verify_chain(r1cs, steps, acc_i, acc_w, bases,
                               z0=z0, zn=[zn[0] + 1])
    # a chain of UNLINKED (but individually valid) steps -> reject
    unlinked = [_toy_witness(x) for x in (3, 5)]
    ai, aw, st = NF.fold_chain(r1cs, unlinked, bases)
    assert not NF.verify_chain(r1cs, st, ai, aw, bases)
    # a non-strict step instance (u != 1 or E-commitment present) -> reject:
    # a relaxed step with E := AZ∘BZ − u·CZ makes ANY public output
    # "satisfiable", so strictness is load-bearing for soundness
    forged = NF.RelaxedInstance(steps[1][0].com_w, NF.C.G1_GEN,
                                steps[1][0].u, list(steps[1][0].x))
    bad_steps2 = list(steps)
    bad_steps2[1] = (forged, steps[1][1])
    assert not NF.verify_chain(r1cs, bad_steps2, acc_i, acc_w, bases)
    # a non-witness step cannot be folded in silently: fold a bogus strict
    # witness and the final relaxed check fails
    bogus = _toy_witness(3)
    bogus[1] = (bogus[1] + 1) % R.P  # wrong public output
    acc_i2, acc_w2, steps2 = NF.fold_chain(r1cs, [wits[0], bogus], bases)
    assert not NF.relaxed_check(r1cs, acc_i2, acc_w2, bases)


@pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="~minutes of host group ops; run with CIRCUITS_TPU_SLOW=1",
)
def test_nova_nifs_real_step_circuit():
    """Fold two REAL IncrementalMstInclusion step witnesses (the circuit
    the reference's Nova example folds) and verify the accumulator."""
    from circuits_halo2_tpu.merkle import circom_r1cs as CR
    from circuits_halo2_tpu.models import nova_fold as NF

    p0 = CM.build_merkle_proof(STATES[0], 0)
    r1cs, w0 = CR.build_incremental_mst_inclusion(p0, (0, 0))
    us1 = CM.user_state_next(0, p0.username, p0.user_balances)
    ls1 = CM.liabilities_state_next(0, p0.root.hash)
    p1 = CM.build_merkle_proof(STATES[1], 0)
    _, w1 = CR.build_incremental_mst_inclusion(p1, (us1, ls1))
    n = max(r1cs.n_wires, len(r1cs.constraints))
    bases = NF.pedersen_bases(n)
    acc_i, acc_w, steps = NF.fold_chain(r1cs, [w0, w1], bases)
    assert NF.verify_chain(r1cs, steps, acc_i, acc_w, bases)


REF_R1CS = "/root/reference/zk_prover/examples/build/incremental_mst_inclusion.r1cs"


@pytest.mark.skipif(not os.path.exists(REF_R1CS), reason="reference artifact absent")
def test_reference_r1cs_artifact_interface_parity():
    """Cross-check against the reference's SHIPPED circom artifact
    (`zk_prover/examples/build/incremental_mst_inclusion.r1cs`, compiled
    from `IncrementalMstInclusion(4, 2, 14)` with `public [step_in]` —
    incremental_mst_inclusion.circom:76).

    The constraint COUNTS legitimately differ (this repo's circom sources
    are an independent rewrite — per-signal Mux1 vs MultiMux1), but the
    circuit's signal INTERFACE is pinned by the template signature, so the
    iden3 header's public/private IO counts must match our synthesis
    exactly, and the artifact must parse as well-formed BN254-Fr R1CS."""
    ref = R.read_r1cs(REF_R1CS)  # read_r1cs asserts prime == BN254 Fr

    # interface: 2 public outputs (step_out), 2 public inputs (step_in)
    assert ref.n_pub_out == 2
    assert ref.n_pub_in == 2

    proof = CM.build_merkle_proof(STATES[0], 0)  # 16 leaves -> LEVELS=4
    ours, wit = R.build_incremental_mst_inclusion(proof, (0, 0), n_bytes=14)
    assert (ours.n_pub_out, ours.n_pub_in) == (ref.n_pub_out, ref.n_pub_in)
    # private-input signal count is fixed by the template signature:
    # username + N_CUR balances + LEVELS hashes + LEVELS*N_CUR balances +
    # LEVELS path bits = 1 + 2 + 4 + 8 + 4 = 19
    assert ours.n_prv_in == ref.n_prv_in == 19

    # well-formed body: every referenced wire index is in range
    assert len(ref.constraints) > 0
    for a, b, c in ref.constraints:
        for lc in (a, b, c):
            for w in lc:
                assert 0 <= w < ref.n_wires

"""CompressedSNARK (Spartan + IPA-PC) over the folded Nova accumulator.

Mirrors the reference's CompressedSNARK stage
(`zk_prover/examples/nova_incremental_verifier.rs:199-226`): after folding,
the final relaxed-SAT check travels as an O(log|C|) proof instead of the
witness. Positive roundtrip + tamper negatives, all on the toy IVC chain
(pure host math, no device work)."""

from circuits_halo2_tpu.merkle.circom_r1cs import P, R1CS
from circuits_halo2_tpu.models import nova_fold as NF
from circuits_halo2_tpu.models import spartan as SP


def _toy_r1cs():
    cons = [
        ({2: 1}, {2: 1}, {3: 1}),                # x*x = x2
        ({3: 1}, {2: 1}, {4: 1}),                # x2*x = x3
        ({4: 1, 2: 1, 1: P - 1}, {0: 1}, {}),    # x3 + x - out = 0
    ]
    return R1CS(5, 1, 1, 0, cons)


def _toy_witness(x):
    return [1, (x**3 + x) % P, x, x * x % P, x**3 % P]


def _fold_toy_chain(n_steps=3):
    r1cs = _toy_r1cs()
    bases = NF.pedersen_bases(8)
    xs = [3]
    for _ in range(n_steps - 1):
        xs.append((xs[-1] ** 3 + xs[-1]) % P)
    wits = [_toy_witness(x) for x in xs]
    acc_i, acc_w, steps = NF.fold_chain(r1cs, wits, bases)
    z0, zn = [xs[0]], [(xs[-1] ** 3 + xs[-1]) % P]
    return r1cs, bases, acc_i, acc_w, steps, z0, zn


def test_compress_roundtrip():
    r1cs, bases, acc_i, acc_w, steps, z0, zn = _fold_toy_chain()
    # the accumulator is genuinely relaxed (E != 0, u != 1)
    assert any(acc_w.e) and acc_i.u != 1
    proof = SP.compress(r1cs, acc_i, acc_w, bases)
    assert SP.verify_compressed(r1cs, acc_i, proof, bases)
    # full chain verification with the compressed tail
    assert SP.verify_chain_compressed(
        r1cs, steps, acc_i, proof, bases, n_w=len(acc_w.w), z0=z0, zn=zn
    )
    # the proof is logarithmic-size: far below the witness+error reveal
    wit_bytes = 32 * (len(acc_w.w) + len(acc_w.e))
    assert proof.size_bytes() > 0
    # toy circuit is tiny so just sanity the structure: 2 IPA transcripts
    assert len(proof.ipa_w.lr) == 1 and len(proof.ipa_e.lr) == 2
    del wit_bytes


def test_compress_size_independent_of_chain_length():
    """The compressed proof depends only on |C|: chains of 2 and 5 steps
    produce byte-identical proof SHAPES (same sumcheck rounds, same IPA
    depth) — chain length only adds O(1)-size fold steps."""
    sizes = []
    for n in (2, 5):
        r1cs, bases, acc_i, acc_w, _, _, _ = _fold_toy_chain(n)
        proof = SP.compress(r1cs, acc_i, acc_w, bases)
        assert SP.verify_compressed(r1cs, acc_i, proof, bases)
        sizes.append(proof.size_bytes())
    assert sizes[0] == sizes[1]


def test_compress_rejects_tampering():
    r1cs, bases, acc_i, acc_w, steps, z0, zn = _fold_toy_chain()
    proof = SP.compress(r1cs, acc_i, acc_w, bases)

    import copy

    # claimed matrix evaluations
    for fld in ("v_a", "v_b", "v_c", "v_e", "w_eval"):
        bad = copy.deepcopy(proof)
        setattr(bad, fld, (getattr(bad, fld) + 1) % P)
        assert not SP.verify_compressed(r1cs, acc_i, bad, bases), fld
    # sumcheck round polynomial
    bad = copy.deepcopy(proof)
    bad.sc1_polys[0][2] = (bad.sc1_polys[0][2] + 1) % P
    assert not SP.verify_compressed(r1cs, acc_i, bad, bases)
    bad = copy.deepcopy(proof)
    bad.sc2_polys[0][1] = (bad.sc2_polys[0][1] + 1) % P
    assert not SP.verify_compressed(r1cs, acc_i, bad, bases)
    # IPA final scalar / round points
    bad = copy.deepcopy(proof)
    bad.ipa_w.a_final = (bad.ipa_w.a_final + 1) % P
    assert not SP.verify_compressed(r1cs, acc_i, bad, bases)
    bad = copy.deepcopy(proof)
    bad.ipa_e.lr[0] = (bad.ipa_e.lr[0][1], bad.ipa_e.lr[0][0])
    assert not SP.verify_compressed(r1cs, acc_i, bad, bases)
    # proof bound to the instance: a different accumulator must reject it
    other = NF.RelaxedInstance(
        acc_i.com_w, acc_i.com_e, acc_i.u, [(v + 1) % P for v in acc_i.x]
    )
    assert not SP.verify_compressed(r1cs, other, proof, bases)
    # and through the chain wrapper: forged endpoint
    assert not SP.verify_chain_compressed(
        r1cs, steps, acc_i, proof, bases, n_w=len(acc_w.w),
        z0=z0, zn=[(zn[0] + 1) % P]
    )


def test_compress_rejects_false_statement():
    """A syntactically valid proof for an UNSATISFIABLE instance cannot be
    produced by the honest prover path: folding in a bogus step yields an
    accumulator whose honest compression fails verification (the sumcheck
    claim of 0 is false)."""
    r1cs = _toy_r1cs()
    bases = NF.pedersen_bases(8)
    good = _toy_witness(3)
    bogus = _toy_witness(3)
    bogus[1] = (bogus[1] + 1) % P  # wrong public output
    acc_i, acc_w, _ = NF.fold_chain(r1cs, [good, bogus], bases)
    assert not NF.relaxed_check(r1cs, acc_i, acc_w, bases)
    proof = SP.compress(r1cs, acc_i, acc_w, bases)
    assert not SP.verify_compressed(r1cs, acc_i, proof, bases)


import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="~minutes of host group ops; run with CIRCUITS_TPU_SLOW=1",
)
def test_compress_real_step_circuit():
    """CompressedSNARK over the REAL IncrementalMstInclusion accumulator
    (the circuit the reference's Nova example folds): fold 2 steps, compress,
    verify — proof is KBs instead of the ~270KB witness+error reveal."""
    from circuits_halo2_tpu.merkle import circom_mst as CM
    from circuits_halo2_tpu.merkle import circom_r1cs as CR

    HERE = os.path.dirname(os.path.abspath(__file__))
    states = [
        os.path.join(HERE, "fixtures_csv", "states", f"entry_16_{i}.csv")
        for i in (1, 2)
    ]
    p0 = CM.build_merkle_proof(states[0], 0)
    r1cs, w0 = CR.build_incremental_mst_inclusion(p0, (0, 0))
    us1 = CM.user_state_next(0, p0.username, p0.user_balances)
    ls1 = CM.liabilities_state_next(0, p0.root.hash)
    p1 = CM.build_merkle_proof(states[1], 0)
    _, w1 = CR.build_incremental_mst_inclusion(p1, (us1, ls1))
    n = SP._next_pow2(max(r1cs.n_wires, len(r1cs.constraints)))
    bases = NF.pedersen_bases(n)
    acc_i, acc_w, steps = NF.fold_chain(r1cs, [w0, w1], bases)
    proof = SP.compress(r1cs, acc_i, acc_w, bases)
    assert SP.verify_chain_compressed(
        r1cs, steps, acc_i, proof, bases, n_w=len(acc_w.w))
    wit_bytes = 32 * (len(acc_w.w) + len(acc_w.e))
    assert proof.size_bytes() < wit_bytes // 20

"""Nova curve-cycle recursion: fold-verifier-in-circuit tests.

Mirrors the structural target of the reference's RecursiveSNARK usage
(`zk_prover/examples/nova_incremental_verifier.rs:170-226`): the augmented
circuits embed the NIFS fold verifier over the BN254/grumpkin cycle, so
the chain proof size and verification time are independent of N.
"""

import copy
import os
import random

import pytest

from circuits_halo2_tpu.models import nova_cycle as NC
from circuits_halo2_tpu.models import r1cs_dsl as D
from circuits_halo2_tpu.ops import grumpkin as GK
from circuits_halo2_tpu.ops.field import FQ_MOD, FR_MOD

slow = pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="multi-minute chain; run with CIRCUITS_TPU_SLOW=1",
)


def test_grumpkin_cycle_structure():
    # grumpkin: defined over Fr, order Fq — the BN254 cycle partner
    assert GK.P == FR_MOD and GK.ORDER == FQ_MOD
    assert GK.is_on_curve(GK.GEN)
    assert GK.mul(GK.GEN, GK.ORDER) is None
    a, b = GK.mul(GK.GEN, 123), GK.mul(GK.GEN, 456)
    assert GK.add(a, b) == GK.mul(GK.GEN, 579)


def test_ec_gadgets_match_host():
    b = D.Builder(FR_MOD)
    P1, P2 = GK.mul(GK.GEN, 123), GK.mul(GK.GEN, 999)
    p1, p2 = D.PointVar.alloc(b, P1), D.PointVar.alloc(b, P2)
    assert D.ec_add(b, p1, p2).value(b) == GK.add(P1, P2)
    assert D.ec_double(b, p1).value(b) == GK.double(P1)
    pid = D.PointVar.alloc(b, None)
    assert D.ec_add(b, pid, p1).value(b) == P1
    assert D.ec_add(b, p1, pid).value(b) == P1
    assert D.ec_add(b, pid, pid).value(b) is None
    assert D.ec_add(b, p1, D.PointVar.alloc(b, GK.neg(P1))).value(b) is None
    assert D.ec_add(b, p1, p1).value(b) == GK.double(P1)
    k = 0x1ABCDEF0123456789
    bits = b.bits_of(b.new_wire(k), 125)
    assert D.ec_scalar_mul(b, bits, p1).value(b) == GK.mul(P1, k)
    sys_, wit = b.finish()
    assert sys_.check(wit) == []


def test_foreign_fold_gadget():
    rng = random.Random(3)
    b = D.Builder(FR_MOD)
    m = FQ_MOD
    x1v, x2v = rng.randrange(m), rng.randrange(m)
    rv = rng.getrandbits(125)
    x1 = D.alloc_foreign(b, x1v, m)
    x2 = D.alloc_foreign(b, x2v, m)
    r = b.new_wire(rv)
    out = D.foreign_fold(b, m, x1, x2, r, rv)
    assert D.foreign_value(b, out) == (x1v + rv * x2v) % m
    sys_, wit = b.finish()
    assert sys_.check(wit) == []


def _toy_secondary(a, b_):
    bld = D.Builder(NC.F2)
    pub = bld.new_wire(a * b_ % NC.F2)
    bld.public.append(1)
    wa, wb = bld.new_wire(a), bld.new_wire(b_)
    bld.assert_mul(wa, wb, pub)
    return bld.finish()


def test_fold_circuit_matches_host_nifs():
    sys2, wit_full = _toy_secondary(3, 5)
    bases_w = NC.pedersen_bases_e2(8)
    bases_e = NC.pedersen_bases_e2(8)
    i1, w1 = NC.make_strict(sys2, wit_full, bases_w, NC._E2)
    assert NC.strict_satisfied(sys2, i1, w1, bases_w, bases_e, NC._E2)
    _, wf2 = _toy_secondary(7, 11)
    i2, w2 = NC.make_strict(sys2, wf2, bases_w, NC._E2)

    ppd = 424242
    U0 = NC.default_instance()
    W0 = NC.Witness([0] * len(w1.w), [0] * len(w1.e))
    U1, W1, _, _ = NC.nifs_fold_host(
        sys2, bases_e, NC._E2, ppd, U0, W0, i1, w1
    )
    assert NC.relaxed_satisfied(sys2, U1, W1, bases_w, bases_e, NC._E2)
    U2, W2, comT2, r2 = NC.nifs_fold_host(
        sys2, bases_e, NC._E2, ppd, U1, W1, i2, w2
    )
    assert NC.relaxed_satisfied(sys2, U2, W2, bases_w, bases_e, NC._E2)

    b = D.Builder(NC.F1)
    pp1, _ = NC._ro_params()
    ppw = b.new_wire(ppd)
    Uv = NC.InstanceVar.alloc(b, U1, NC.F2)
    uv = NC.InstanceVar.alloc(b, i2, NC.F2)
    Tv = D.PointVar.alloc(b, comT2)
    U2v, r_lc = NC.nifs_fold_circuit(b, pp1, NC.F2, ppw, Uv, uv, Tv)
    assert b.eval(r_lc) == r2
    assert U2v.com_w.value(b) == U2.com_w
    assert U2v.com_e.value(b) == U2.com_e
    assert D.foreign_value(b, U2v.u) == U2.u
    assert D.foreign_value(b, U2v.x) == U2.x[0]
    s, wit = b.finish()
    assert s.check(wit) == []


@slow
def test_ivc_chain_end_to_end():
    from circuits_halo2_tpu.merkle import circom_mst as CM

    here = os.path.dirname(os.path.abspath(__file__))
    states = [
        os.path.join(here, "fixtures_csv", "states", f"entry_16_{i}.csv")
        for i in (1, 2, 3)
    ]
    proofs, user_states, liab_states = CM.state_chain(states, 0)
    z0 = [0, 0]
    params = NC.NovaCycleIVC.setup(proofs[0], z0)
    ivc = NC.NovaCycleIVC(params)
    pf = ivc.prove_chain(z0, proofs)
    # chain output equals the reference state chain
    assert pf.z_n == [user_states[-1], liab_states[-1]]
    assert ivc.verify_chain(pf)

    # tampered application output
    bad = copy.deepcopy(pf)
    bad.z_n = [pf.z_n[0] ^ 1, pf.z_n[1]]
    assert not ivc.verify_chain(bad)
    # tampered fresh-instance binding
    bad2 = copy.deepcopy(pf)
    bad2.u2.x[0] ^= 1
    assert not ivc.verify_chain(bad2)
    # tampered running accumulator commitment
    bad3 = copy.deepcopy(pf)
    bad3.U1.com_w = NC._E1.mul(bad3.U1.com_w, 2)
    assert not ivc.verify_chain(bad3)
    # wrong step count
    bad4 = copy.deepcopy(pf)
    bad4.n = pf.n + 1
    assert not ivc.verify_chain(bad4)


# -- CompressedSNARK over the cycle (Spartan generic instantiations) ---------


def _toy_fq_pair(x_val, y_val):
    """Tiny satisfied R1CS over Fq: public out = x·y + x (num_public=1)."""
    b = D.Builder(FQ_MOD)
    out = b.new_wire((x_val * y_val + x_val) % FQ_MOD)  # wire 1 (public)
    x = b.new_wire(x_val)
    y = b.new_wire(y_val)
    xy = b.mul(x, y)
    b.assert_eq(b.add(xy, x), out)
    return b.finish(num_public=1)


def test_fq_spartan_compress_roundtrip():
    """The grumpkin/Fq Spartan instantiation end-to-end on a folded relaxed
    accumulator: two strict toy instances folded by the host NIFS, then
    compressed and verified without the witness (the secondary-side
    machinery of the reference's CompressedSNARK, nova-snark's S2
    parameter, `nova_incremental_verifier.rs:199-226`)."""
    from circuits_halo2_tpu.models import spartan as SP

    sys_a, wit_a = _toy_fq_pair(3, 5)
    sys_b, wit_b = _toy_fq_pair(7, 11)
    assert len(sys_a.constraints) == len(sys_b.constraints)

    bases = NC.pedersen_bases_e2(16)
    u_a, w_a = NC.make_strict(sys_a, wit_a, bases, NC._E2)
    u_b, w_b = NC.make_strict(sys_b, wit_b, bases, NC._E2)
    assert NC.strict_satisfied(sys_a, u_a, w_a, bases, bases, NC._E2)

    U = NC.default_instance()
    W = NC.Witness([0] * (sys_a.num_wires - 2), [0] * len(sys_a.constraints))
    U, W, _, _ = NC.nifs_fold_host(sys_a, bases, NC._E2, 7, U, W, u_a, w_a)
    U, W, _, _ = NC.nifs_fold_host(sys_a, bases, NC._E2, 7, U, W, u_b, w_b)
    assert NC.relaxed_satisfied(sys_a, U, W, bases, bases, NC._E2)
    assert U.u != 1 and any(W.e)  # genuinely relaxed

    ctx = NC.spartan_ctx_e2()
    view = NC._spartan_view(sys_a)
    n_pad = NC._pad_len(sys_a)
    bases_pad = NC.pedersen_bases_e2(n_pad)
    proof = SP.compress(view, U, SP.RelaxedWitness(W.w, W.e), bases_pad, ctx)
    n_w = sys_a.num_wires - 1 - sys_a.num_public
    assert SP.verify_compressed(view, U, proof, bases_pad, n_w=n_w, ctx=ctx)

    # tampering is rejected
    bad = copy.deepcopy(proof)
    bad.w_eval = (bad.w_eval + 1) % FQ_MOD
    assert not SP.verify_compressed(view, U, bad, bases_pad, n_w=n_w, ctx=ctx)
    bad2 = copy.deepcopy(proof)
    bad2.ipa_w.a_final = (bad2.ipa_w.a_final + 1) % FQ_MOD
    assert not SP.verify_compressed(view, U, bad2, bases_pad, n_w=n_w, ctx=ctx)
    other = NC.Instance(U.com_w, U.com_e, U.u, [(U.x[0] + 1) % FQ_MOD])
    assert not SP.verify_compressed(view, other, proof, bases_pad, n_w=n_w, ctx=ctx)


def test_fr_spartan_ctx_matches_default():
    """The E1 context is byte-compatible with spartan's default Fr/G1
    instantiation except for the IPA Q base (domain-separated seed)."""
    ctx = NC.spartan_ctx_e1()
    assert ctx.p == FR_MOD
    from circuits_halo2_tpu.ops import curve as C1

    q = ctx.q_base()
    assert C1.g1_is_on_curve(q)
    # and distinct from spartan's own Q (domain-separated seeds)
    from circuits_halo2_tpu.models import spartan as SP

    assert q != SP._q_base()
    # grumpkin Q is on grumpkin
    q2 = NC.spartan_ctx_e2().q_base()
    assert GK.is_on_curve(q2)


@slow
def test_ivc_chain_compressed():
    """Full cycle: prove a 2-step chain, compress all three accumulators,
    verify without witnesses; tampered variants rejected."""
    from circuits_halo2_tpu.merkle import circom_mst as CM

    here = os.path.dirname(os.path.abspath(__file__))
    states = [
        os.path.join(here, "fixtures_csv", "states", f"entry_16_{i}.csv")
        for i in (1, 2)
    ]
    proofs, user_states, liab_states = CM.state_chain(states, 0)
    z0 = [0, 0]
    params = NC.NovaCycleIVC.setup(proofs[0], z0)
    ivc = NC.NovaCycleIVC(params)
    pf = ivc.prove_chain(z0, proofs)
    assert ivc.verify_chain(pf)

    cp = NC.compress_ivc(params, pf)
    assert NC.verify_ivc_compressed(params, cp)
    # compressed proof is small: no witness vector travels
    assert cp.size_bytes() < 64 * 1024

    bad = copy.deepcopy(cp)
    bad.z_n = [cp.z_n[0] ^ 1, cp.z_n[1]]
    assert not NC.verify_ivc_compressed(params, bad)
    bad2 = copy.deepcopy(cp)
    bad2.pf1.w_eval = (bad2.pf1.w_eval + 1) % FR_MOD
    assert not NC.verify_ivc_compressed(params, bad2)
    bad3 = copy.deepcopy(cp)
    bad3.u2.u = 2
    assert not NC.verify_ivc_compressed(params, bad3)

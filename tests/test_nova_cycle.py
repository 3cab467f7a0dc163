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

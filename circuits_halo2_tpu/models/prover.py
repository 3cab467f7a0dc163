"""PLONKish prover — KZG commitments + SHPLONK (BDFG21) multiopen.

Replaces halo2's ``create_proof`` with ``ProverSHPLONK`` (reference use:
`zk_prover/src/circuits/utils.rs:93-102`). Protocol phases (§3.1 SURVEY):

1. witness synthesis → blinded advice commitments          → θ
2. permuted lookup columns A', S'                          → β, γ
3. permutation & lookup grand products + random poly       → y
4. quotient h(X) on the extended coset domain (device)     → x
5. evaluations at x·ω^rot                                  → ζ, ν
6. SHPLONK h_x commitment W                                → μ, then W'

TPU-shaped: every polynomial lives as a (16, B, n) Montgomery limb tensor.
Lagrange→coeff→extended transforms are ONE batched NTT dispatch over all
columns; grand products are log-depth cumprod scans; batched inversions use
the prefix/suffix-product trick; point evaluations are powers-dot
reductions; the SHPLONK linear divisions are suffix-sum scans
(utils/poly_device). The host touches only scalars: the Fiat–Shamir
transcript, blinding draws, and the tiny (≤3-point) r_j interpolations.
Commitments go through the batched device Pippenger (ops/msm).

This replaces halo2's rayon-parallel per-row loops
(`plonk/prover.rs` + `poly/domain.rs` in the summa-dev fork) with
log-depth device collectives — the design that scales to the k=17
north-star config (BASELINE.md).

Blinding is drawn from an injectable deterministic RNG so proofs are
reproducible in tests (the reference uses OsRng — any valid blinding
verifies; see SURVEY §7 "bit-exactness" note).
"""

from __future__ import annotations

import hashlib
import os
import time

import jax.numpy as jnp

from ..ops import field as F
from ..ops import field_jax as FJ
from ..ops import msm as MSM
from ..ops import ntt as NTT
from ..utils import poly_device
from ..utils.srs import ParamsKZG
from ..utils.transcript import KeccakTranscript
from .assignment import Assignment
from .keygen import DELTA, ProvingKey
from .verifier import num_perm_sets, perm_chunk_len, rotation_sets

P = F.FR_MOD


class BlindingRng:
    """Deterministic blinding source (blake2b counter mode)."""

    def __init__(self, seed: bytes = b"circuits-halo2-tpu"):
        self.seed = seed
        self.counter = 0

    def next_field(self) -> int:
        h = hashlib.blake2b(
            self.seed + self.counter.to_bytes(8, "little"), digest_size=64
        ).digest()
        self.counter += 1
        return int.from_bytes(h, "little") % P


def prove(
    params: ParamsKZG,
    pk: ProvingKey,
    circuit,
    config,
    instances: list[list[int]],
    rng: BlindingRng | None = None,
    transcript_cls=KeccakTranscript,
    vk_digest: int | None = None,
    _diag: bool = False,
) -> bytes:
    rng = rng or BlindingRng()
    vk = pk.vk
    cs = vk.cs
    n = 1 << vk.k
    omega = vk.omega
    blinders = cs.blinding_factors()
    usable = n - (blinders + 1)
    nperm = num_perm_sets(cs)
    chunk = perm_chunk_len(cs)

    dom = poly_device.domain(vk.k, cs.degree())
    PD = poly_device

    _trace = os.environ.get("CIRCUITS_PROVE_TRACE")
    _t0 = time.perf_counter()

    def _mark(label: str) -> None:
        """Per-phase wall-clock (CIRCUITS_PROVE_TRACE=1): the ark-std
        start_timer!/end_timer! equivalent (`circuits/utils.rs:53-105`)."""
        nonlocal _t0
        if _trace:
            import sys

            now = time.perf_counter()
            # stderr: bench harnesses pipe stdout into BENCH_NUMBERS.jsonl
            print(f"[prove] {label}: {now - _t0:.3f}s", file=sys.stderr,
                  flush=True)
            _t0 = now

    t = transcript_cls()
    t.common_scalar(vk_digest if vk_digest is not None else vk.transcript_repr)
    for col in instances:
        for v in col:
            t.common_scalar(v)

    # ---- phase 1: witness synthesis + advice commitments ------------------
    asn = Assignment(cs, n, instances)
    circuit.synthesize(config, asn)
    advice = [list(col) for col in asn.advice]
    for col in advice:
        for row in range(usable, n):
            col[row] = rng.next_field()
    instance_vals = [list(col) for col in asn.instance]
    fixed = vk.fixed_values

    # device Lagrange tensors (base domain) for every committed column;
    # commitments run straight off the device tensors (no host digit prep)
    advice_dev = dom.cols_to_device(advice)
    fixed_dev = dom.cols_to_device(fixed)
    inst_dev = dom.cols_to_device(instance_vals)
    sigma_dev = dom.cols_to_device(vk.sigma_values)

    for pt in MSM.msm_commit_dev(params.g_lagrange, advice_dev):
        t.write_point(pt)
    theta = t.squeeze_challenge()
    _mark("phase1 synth+advice commits")

    # ---- phase 2: permuted lookup columns ---------------------------------
    # All lookup input/table compressions run as ONE jitted dispatch; the
    # sort-based permute_expression_pair is inherently host-side.
    ph = _phase23_fns(pk, cs, dom, usable, nperm, chunk)
    theta_m = dom.to_device([theta])

    lookups = []
    a_stack = s_stack = None
    if cs.lookups:
        nlk = len(cs.lookups)
        a_stack, s_stack = ph.compress(advice_dev, fixed_dev, inst_dev, theta_m)
        flat = dom.from_device(
            jnp.concatenate([a_stack, s_stack], axis=1).reshape(16, -1)
        )
    for li, lk in enumerate(cs.lookups):
        a_dev = a_stack[:, li]
        s_dev = s_stack[:, li]
        a_comp = flat[li * n : (li + 1) * n]
        s_comp = flat[(nlk + li) * n : (nlk + li + 1) * n]

        # permute_expression_pair (halo2 lookup/prover.rs semantics)
        a_perm = sorted(a_comp[:usable])
        table_counts: dict[int, int] = {}
        for v in s_comp[:usable]:
            table_counts[v] = table_counts.get(v, 0) + 1
        s_perm = [0] * usable
        repeated_rows = []
        for row, v in enumerate(a_perm):
            if row == 0 or v != a_perm[row - 1]:
                s_perm[row] = v
                cnt = table_counts.get(v, 0)
                assert cnt > 0, "lookup input value not in table"
                table_counts[v] = cnt - 1
            else:
                repeated_rows.append(row)
        for v in sorted(table_counts):
            for _ in range(table_counts[v]):
                s_perm[repeated_rows.pop()] = v
        assert not repeated_rows
        a_perm = a_perm + [rng.next_field() for _ in range(blinders + 1)]
        s_perm = s_perm + [rng.next_field() for _ in range(blinders + 1)]
        lookups.append(
            {"a_dev": a_dev, "s_dev": s_dev, "a_perm": a_perm, "s_perm": s_perm}
        )
    if lookups:
        ap_stack = dom.cols_to_device([lk["a_perm"] for lk in lookups])
        sp_stack = dom.cols_to_device([lk["s_perm"] for lk in lookups])
        for li, lk in enumerate(lookups):
            lk["ap_dev"] = ap_stack[:, li]
            lk["sp_dev"] = sp_stack[:, li]
        inter = jnp.stack(
            [c for li in range(len(lookups))
             for c in (ap_stack[:, li], sp_stack[:, li])],
            axis=1,
        )
        for pt in MSM.msm_commit_dev(params.g_lagrange, inter):
            t.write_point(pt)

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()
    _mark("phase2 lookup permute+commit")

    # ---- phase 3: grand products + random poly ----------------------------
    # Every permutation-set and lookup grand product (batched inversion +
    # log-depth cumprod each) is ONE jitted dispatch; the z columns come
    # back in a single host pull for blinding + commitment.
    beta_m = dom.to_device([beta])
    gamma_m = dom.to_device([gamma])
    if lookups:
        z_stack = ph.grand(
            advice_dev, fixed_dev, inst_dev, sigma_dev,
            a_stack, s_stack, ap_stack, sp_stack, beta_m, gamma_m,
        )
    else:
        z_stack = ph.grand_nolk(
            advice_dev, fixed_dev, inst_dev, sigma_dev, beta_m, gamma_m
        )
    # blinding rows (usable+1 .. n-1) splice in on device; the z columns
    # never round-trip to the host (same rng draw order as the reference)
    nz = nperm + len(lookups)
    blind_cols = [
        [rng.next_field() for _ in range(blinders)] for _ in range(nz)
    ]
    z_stack = jnp.concatenate(
        [z_stack[:, :, : usable + 1], dom.cols_to_device(blind_cols)], axis=-1
    )

    finish_z = MSM.msm_commit_dev_async(params.g_lagrange, z_stack)

    random_poly = [rng.next_field() for _ in range(n)]
    random_dev = dom.to_device(random_poly)  # coefficient form
    finish_r = MSM.msm_commit_dev_async(params.g, random_dev[:, None, :])

    # ---- pipelined Lagrange → coeff → extended transforms -----------------
    # The per-proof ("dynamic") columns concatenate into ONE (16, B, n)
    # tensor whose batched iNTT + coset NTT is dispatched BEFORE the phase-3
    # commitments are materialized: the device overlaps the transforms with
    # the host's commitment pull + transcript hashing (SURVEY §2c axis 4).
    # Proof-independent columns (fixed/sigma/L0/L_last/L_active) come from
    # the per-pk cache — transformed once, reused by every proof.
    group_tensors = [advice_dev, inst_dev, z_stack[:, :nperm]]
    group_names = ["advice", "instance", "perm_z"]
    if lookups:
        group_tensors.append(z_stack[:, nperm:])
        group_names.append("lookup_z")
        group_tensors.append(
            jnp.stack([lk["ap_dev"] for lk in lookups], axis=1)
        )
        group_names.append("lookup_a")
        group_tensors.append(
            jnp.stack([lk["sp_dev"] for lk in lookups], axis=1)
        )
        group_names.append("lookup_s")

    dyn_offsets = {}
    ptr = 0
    for name, tensor in zip(group_names, group_tensors):
        dyn_offsets[name] = ptr
        ptr += tensor.shape[1]
    big_dyn = jnp.concatenate(group_tensors, axis=1)  # (16, B_dyn, n)

    st_coeff, st_ext, st_offsets = _static_transform(pk, cs, dom, usable)
    tfn, gfn = _split_quotient_fns(
        pk, cs, dom, dyn_offsets, st_offsets, nperm, chunk, blinders
    )
    dyn_coeff, dyn_ext = tfn(big_dyn)  # async dispatch — overlaps finish_z

    for pt in finish_z():
        t.write_point(pt)
    t.write_point(finish_r()[0])
    y = t.squeeze_challenge()
    _mark("phase3 grand products+commits")

    # combined coefficient tensor + offset map for the evaluation phases
    offsets = dict(dyn_offsets)
    for name, off in st_offsets.items():
        offsets[name] = ptr + off
    big_coeff = jnp.concatenate([dyn_coeff, st_coeff], axis=1)

    # ---- phase 4: quotient on the extended domain -------------------------
    # Identity evaluation + y-Horner fold + vanishing division + iNTT back
    # to coefficient form, ONE jitted dispatch (the transforms already ran
    # above). Cached on the proving key; challenges enter as traced
    # Montgomery scalars, so every proof after the first reuses the
    # compiled executable.
    y_m = dom.to_device([y])

    if _diag:
        # diagnostics path: the un-split one-big-tensor trace with labelled
        # per-identity tensors
        l0_vals = [0] * n
        l0_vals[0] = 1
        llast_vals = [0] * n
        llast_vals[usable] = 1
        lactive_vals = [1 if r < usable else 0 for r in range(n)]
        big = jnp.concatenate(
            [big_dyn, fixed_dev, sigma_dev,
             dom.cols_to_device([l0_vals, llast_vals, lactive_vals])],
            axis=1,
        )
        dofs = dict(dyn_offsets)
        dofs["fixed"] = ptr + st_offsets["fixed"]
        dofs["sigma"] = ptr + st_offsets["sigma"]
        dofs["special"] = ptr + st_offsets["special"]
        qfn = _quotient_fn(pk, cs, dom, dofs, nperm, chunk, blinders)
        _, _, diag_terms = qfn.eager(big, theta_m, beta_m, gamma_m, y_m)
        check_rows = [0, 1, 2, 3, 4, 5, 6, 42, 43, 44, 45, 46, 82]
        for label, term in diag_terms:
            tc = dom.from_device(dom.extended_to_coeff(
                jnp.broadcast_to(term, (16, dom.n_ext)).astype(jnp.uint32)))
            rem = [0] * n
            for i, c in enumerate(tc):
                rem[i % n] = (rem[i % n] + c) % P
            evals = NTT.ntt_host(rem, omega)
            bad_rows = [j for j in check_rows if evals[j]]
            total_bad = sum(1 for v in evals if v)
            if total_bad:
                print(f'BAD {label}: {total_bad} rows, sampled {bad_rows}')
            else:
                print(f'ok  {label}')
        raise SystemExit(0)

    h_coeff_dev = gfn(dyn_ext, st_ext, theta_m, beta_m, gamma_m, y_m)

    def cdev(v):
        return dom.const_dev(v % P)

    def coeff_slice(name, idx):
        return big_coeff[:, offsets[name] + idx]

    # commit the (degree-1) quotient pieces straight from the device tensor
    num_h = cs.degree() - 1
    for pt in MSM.msm_commit_dev(
        params.g, h_coeff_dev[:, : num_h * n].reshape(16, num_h, n)
    ):
        t.write_point(pt)
    x = t.squeeze_challenge()
    _mark("phase4 quotient+commit")

    # ---- phase 5: evaluations (ONE batched powers-dot dispatch) -----------
    x_next = x * omega % P
    x_prev = x * F.fr_inv(omega) % P
    x_last = x * F.fr_pow(F.fr_inv(omega), blinders + 1) % P
    x_n = F.fr_pow(x, n)

    sets = rotation_sets(cs)
    point_of = {}
    for rots, _ in sets:
        for r in rots:
            point_of.setdefault(r, x * F.fr_pow(omega, r % n) % P)

    # every distinct opening point, interned in a fixed order
    pt_idx: dict[int, int] = {}
    for p in [x, x_next, x_prev, x_last, *point_of.values()]:
        pt_idx.setdefault(p, len(pt_idx))
    for col, rot_i in cs.advice_queries + cs.fixed_queries:
        pt_idx.setdefault(x * F.fr_pow(omega, rot_i % n) % P, len(pt_idx))
    points = list(pt_idx)

    xn_pows = [F.fr_pow(x_n, i) for i in range(num_h)]

    p56 = _phase56_fns(pk, cs, dom, offsets, num_h, sets)
    evs_dev, rand_dev_evals, quot_dev_evals, tail_zero = p56.eval_all(
        big_coeff, h_coeff_dev, random_dev, dom.to_device(xn_pows),
        dom.to_device(points)
    )
    npts = len(points)
    allv = dom.from_device(
        jnp.concatenate(
            [evs_dev.reshape(16, -1), rand_dev_evals, quot_dev_evals], axis=1
        )
    )
    assert bool(tail_zero), "quotient degree overflow"
    ncols_total = evs_dev.shape[1]

    def ev(name, idx, point) -> int:
        return allv[(offsets[name] + idx) * npts + pt_idx[point]]

    def random_eval(point) -> int:
        return allv[ncols_total * npts + pt_idx[point]]

    def quotient_eval(point) -> int:
        return allv[(ncols_total + 1) * npts + pt_idx[point]]

    for col, rot_i in cs.advice_queries:
        t.write_scalar(ev("advice", col, x * F.fr_pow(omega, rot_i % n) % P))
    for col, rot_i in cs.fixed_queries:
        t.write_scalar(ev("fixed", col, x * F.fr_pow(omega, rot_i % n) % P))
    t.write_scalar(random_eval(x))
    for i in range(len(cs.permutation_columns)):
        t.write_scalar(ev("sigma", i, x))
    for s in range(nperm):
        t.write_scalar(ev("perm_z", s, x))
        t.write_scalar(ev("perm_z", s, x_next))
        if s < nperm - 1:
            t.write_scalar(ev("perm_z", s, x_last))
    for li in range(len(cs.lookups)):
        t.write_scalar(ev("lookup_z", li, x))
        t.write_scalar(ev("lookup_z", li, x_next))
        t.write_scalar(ev("lookup_a", li, x))
        t.write_scalar(ev("lookup_a", li, x_prev))
        t.write_scalar(ev("lookup_s", li, x))

    zeta = t.squeeze_challenge()
    nu = t.squeeze_challenge()
    _mark("phase5 evaluations")

    # ---- phase 6: SHPLONK multiopen (two jitted dispatches) ---------------
    # Host: tiny per-set scalar work (r_j interpolation, evals at the ≤3 set
    # points). Device dispatch A: f_j combination, r_j subtraction, the
    # chained (X - z) divisions and the ν-fold → h(X). Dispatch B (after μ):
    # the final L(X)/(X - μ) → W'.
    def poly_eval_at(poly, point) -> int:
        kind = poly[0]
        if kind == "quotient":
            return quotient_eval(point)
        if kind == "random":
            return random_eval(point)
        return ev(kind, poly[1], point)

    max_polys = max(len(polys) for _, polys in sets)
    zeta_pows = [pow(zeta, i, P) for i in range(max_polys)]
    nu_pows = [pow(nu, j, P) for j in range(len(sets))]

    set_evals = []  # per set: evals of f_j at the set's points
    r_rows = []     # per set: r_j interpolation coefficients (padded)
    max_rots = max(len(rots) for rots, _ in sets)
    for rots, polys in sets:
        pts_j = [point_of[r] for r in rots]
        evals = [0] * len(rots)
        for i, poly in enumerate(polys):
            for ri, r in enumerate(rots):
                evals[ri] = (
                    evals[ri] + zeta_pows[i] * poly_eval_at(poly, point_of[r])
                ) % P
        set_evals.append(evals)
        # r_j: Lagrange interpolation through (pts_j, evals) — tiny, host
        r_coeffs = [0] * len(pts_j)
        for i, (pt, ev_i) in enumerate(zip(pts_j, evals)):
            basis = [1]
            denom = 1
            for jj, other in enumerate(pts_j):
                if jj == i:
                    continue
                basis = [
                    ((basis[kk - 1] if kk > 0 else 0) - other * (basis[kk] if kk < len(basis) else 0))
                    % P
                    for kk in range(len(basis) + 1)
                ]
                denom = denom * (pt - other) % P
            scale = ev_i * F.fr_inv(denom) % P
            for kk, b in enumerate(basis):
                r_coeffs[kk] = (r_coeffs[kk] + scale * b) % P
        r_rows.append(r_coeffs + [0] * (max_rots - len(r_coeffs)))

    ipoints = [pow(p, -1, P) for p in points]
    set_pt_idx = tuple(
        tuple(pt_idx[point_of[r]] for r in rots) for rots, _ in sets
    )
    h_x_dev, f_stack = p56.open_w(
        big_coeff,
        h_coeff_dev,
        random_dev,
        dom.to_device(xn_pows),
        dom.to_device(zeta_pows),
        dom.to_device(nu_pows),
        dom.cols_to_device(r_rows),
        dom.to_device(points),
        dom.to_device(ipoints),
        set_pt_idx,
    )
    t.write_point(MSM.msm_commit_dev(params.g, h_x_dev[:, None, :])[0])
    mu = t.squeeze_challenge()
    _mark("phase6a shplonk W")

    diffs = []
    for rots, _ in sets:
        d = 1
        for r, pt in point_of.items():
            if r not in rots:
                d = d * ((mu - pt) % P) % P
        diffs.append(d)
    diff0_inv = F.fr_inv(diffs[0])
    z0_mu = 1
    for r in sets[0][0]:
        z0_mu = z0_mu * ((mu - point_of[r]) % P) % P

    total_rmu = 0
    coeffs = []
    for j, (rots, _) in enumerate(sets):
        norm = diffs[j] * diff0_inv % P
        pts_j = [point_of[r] for r in rots]
        # r_j(mu) via barycentric through the set points (host, ≤3 points)
        r_mu = 0
        for i, (pt, ev_i) in enumerate(zip(pts_j, set_evals[j])):
            li = 1
            for jj, other in enumerate(pts_j):
                if jj != i:
                    li = li * ((mu - other) * F.fr_inv((pt - other) % P) % P) % P
            r_mu = (r_mu + ev_i * li) % P
        coeff = nu_pows[j] * norm % P
        total_rmu = (total_rmu + coeff * r_mu) % P
        coeffs.append(coeff)

    w_prime_dev = p56.open_wprime(
        f_stack,
        h_x_dev,
        dom.to_device(coeffs),
        dom.to_device([z0_mu]),
        dom.to_device([total_rmu]),
        dom.to_device([mu]),
        dom.to_device([pow(mu, -1, P)]),
    )
    t.write_point(MSM.msm_commit_dev(params.g, w_prime_dev[:, None, :])[0])
    _mark("phase6b shplonk W'")

    return t.finalize()


class _Phase23:
    def __init__(self, compress, grand, grand_nolk):
        self.compress = compress
        self.grand = grand
        self.grand_nolk = grand_nolk


class _Phase56:
    def __init__(self, eval_all, open_w, open_wprime):
        self.eval_all = eval_all
        self.open_w = open_w
        self.open_wprime = open_wprime


def _phase56_fns(pk, cs, dom, offsets, num_h, sets):
    """Jitted phase-5/6 evaluators, cached on the proving key.

    ``eval_all`` evaluates every committed column (and the random poly) at
    every distinct opening point in one dispatch. ``open_w`` performs the
    whole SHPLONK f_j/ν-fold with the chained linear divisions → h(X);
    ``open_wprime`` builds L(X)/(X-μ) → W'. The per-set point indices are a
    static argument (they only change if two opening points collide)."""
    # keyed by (domain, column layout): the single prover's split layout
    # and the batch prover's one-big-tensor layout use different offsets
    okey = (id(dom),) + tuple(sorted(offsets.items()))
    cached = pk.__dict__.get("_phase56_cache")
    if cached is not None and cached[0] == okey:
        return cached[1]

    import functools

    import jax

    n = dom.n

    @jax.jit
    def eval_all(big_coeff, h_coeff, random_dev, xn_pows, pts_m):
        npts = pts_m.shape[1]
        # x^n-combined quotient h(X) (keeps the O(num_h·n) fold and the
        # per-point Horner off the host)
        h_pieces = h_coeff[:, : num_h * n].reshape(16, num_h, n)
        h_combined = None
        for i in range(num_h):
            piece = FJ.mont_mul(h_pieces[:, i], xn_pows[:, i : i + 1])
            h_combined = piece if h_combined is None else FJ.add_mod(h_combined, piece)
        # one point at a time: the all-points-at-once product materialized
        # a (limbs, B, npts, n) intermediate that XLA padded to 66 GB at
        # k=17 — per point the temp is (limbs, B, n), well inside HBM
        evs_l, rnd_l, quot_l = [], [], []
        for i in range(npts):
            pw = poly_device._powers_dev(pts_m[:, i : i + 1], n)  # (16, n)
            evs_l.append(poly_device.tree_sum_mod(
                FJ.mont_mul(big_coeff, pw[:, None, :]))[..., 0])  # (16, B)
            rnd_l.append(poly_device.tree_sum_mod(
                FJ.mont_mul(random_dev, pw))[..., 0])             # (16,)
            quot_l.append(poly_device.tree_sum_mod(
                FJ.mont_mul(h_combined, pw))[..., 0])             # (16,)
        evs = jnp.stack(evs_l, axis=-1)   # (16, B, npts)
        rnd = jnp.stack(rnd_l, axis=-1)   # (16, npts)
        quot = jnp.stack(quot_l, axis=-1)  # (16, npts)
        tail_zero = jnp.all(h_coeff[:, num_h * n :] == 0)
        return evs, rnd, quot, tail_zero

    @functools.partial(jax.jit, static_argnums=(9,))
    def open_w(big_coeff, h_coeff, random_dev, xn_pows, zeta_pows, nu_pows,
               r_tensor, pts_m, ipts_m, set_pt_idx):
        h_pieces = h_coeff[:, : num_h * n].reshape(16, num_h, n)
        h_combined = None
        for i in range(num_h):
            piece = FJ.mont_mul(h_pieces[:, i], xn_pows[:, i : i + 1])
            h_combined = piece if h_combined is None else FJ.add_mod(h_combined, piece)

        def poly_coeff(poly):
            kind = poly[0]
            if kind == "quotient":
                return h_combined
            if kind == "random":
                return random_dev
            return big_coeff[:, offsets[kind] + poly[1]]

        pw_cache: dict = {}

        def pws(idx):
            if idx not in pw_cache:
                pw_cache[idx] = (
                    poly_device._powers_dev(pts_m[:, idx : idx + 1], n),
                    poly_device._powers_dev(ipts_m[:, idx : idx + 1], n),
                )
            return pw_cache[idx]

        h_x = None
        f_list = []
        max_rots = r_tensor.shape[2]
        pad = jnp.zeros((16, n - max_rots), jnp.uint32)
        for j, (rots, polys) in enumerate(sets):
            f = None
            for i, poly in enumerate(polys):
                pc = FJ.mont_mul(poly_coeff(poly), zeta_pows[:, i : i + 1])
                f = pc if f is None else FJ.add_mod(f, pc)
            f_list.append(f)
            r_pad = jnp.concatenate([r_tensor[:, j], pad], axis=1)
            q = FJ.sub_mod(f, r_pad)
            for idx in set_pt_idx[j]:
                pw, ipw = pws(idx)
                q = poly_device._divide_linear_dev(q, pw, ipw, n)
            q = FJ.mont_mul(q, nu_pows[:, j : j + 1])
            h_x = q if h_x is None else FJ.add_mod(h_x, q)
        return h_x, jnp.stack(f_list, axis=1)

    @jax.jit
    def open_wprime(f_stack, h_x, coeffs_m, z0mu_m, totalrmu_m, mu_m, imu_m):
        l_dev = None
        for j in range(len(sets)):
            fc = FJ.mont_mul(f_stack[:, j], coeffs_m[:, j : j + 1])
            l_dev = fc if l_dev is None else FJ.add_mod(l_dev, fc)
        l_dev = FJ.sub_mod(l_dev, FJ.mont_mul(h_x, z0mu_m))
        l0 = FJ.sub_mod(l_dev[:, :1], totalrmu_m)
        l_dev = jnp.concatenate([l0, l_dev[:, 1:]], axis=1)
        pw = poly_device._powers_dev(mu_m, n)
        ipw = poly_device._powers_dev(imu_m, n)
        return poly_device._divide_linear_dev(l_dev, pw, ipw, n)

    p56 = _Phase56(eval_all, open_w, open_wprime)
    pk._phase56_cache = (okey, p56)
    return p56


def _phase23_fns(pk, cs, dom, usable, nperm, chunk):
    """Jitted phase-2/3 evaluators, cached on the proving key.

    ``compress(advice, fixed, inst, θ) -> (a_stack, s_stack)`` evaluates and
    θ-compresses every lookup's input/table expressions in one dispatch.
    ``grand(...) -> (16, nperm+nlk, n)`` computes every permutation-set and
    lookup grand product in one dispatch (chained set starts stay on
    device).
    """
    cached = pk.__dict__.get("_phase23_cache")
    if cached is not None and cached[0] is dom:
        return cached[1]

    import jax

    n = dom.n

    def _base_ops(advice_dev, fixed_dev, inst_dev):
        def base_col(kind, idx):
            return {"advice": advice_dev, "fixed": fixed_dev,
                    "instance": inst_dev}[kind][:, idx]

        return {
            "constant": lambda v: dom.const_dev(v % P),
            "fixed": lambda q, c, r: dom.rotate_base(base_col("fixed", c), r),
            "advice": lambda q, c, r: dom.rotate_base(base_col("advice", c), r),
            "instance": lambda q, c, r: dom.rotate_base(base_col("instance", c), r),
            "negated": lambda a: FJ.neg_mod(a),
            "sum": lambda a, b: FJ.add_mod(a, b),
            "product": lambda a, b: FJ.mont_mul(a, b),
            "scaled": lambda a, k: FJ.mont_mul(a, dom.const_dev(k % P)),
            "selector": None,
        }, base_col

    @jax.jit
    def compress(advice_dev, fixed_dev, inst_dev, theta_m):
        base_ops, _ = _base_ops(advice_dev, fixed_dev, inst_dev)

        def one_lookup(exprs):
            acc = None
            for expr in exprs:
                v = jnp.broadcast_to(expr.evaluate(base_ops), (16, n)).astype(jnp.uint32)
                acc = v if acc is None else FJ.add_mod(FJ.mont_mul(acc, theta_m), v)
            return acc

        a_stack = jnp.stack([one_lookup(lk.input_exprs) for lk in cs.lookups], axis=1)
        s_stack = jnp.stack([one_lookup(lk.table_exprs) for lk in cs.lookups], axis=1)
        return a_stack, s_stack

    def _grand_core(advice_dev, fixed_dev, inst_dev, sigma_dev,
                    beta_m, gamma_m, lk_tensors):
        _, base_col = _base_ops(advice_dev, fixed_dev, inst_dev)
        one_t = jnp.broadcast_to(dom.const_dev(1), (16, n)).astype(jnp.uint32)
        active_mask = jnp.arange(n) < usable
        omega_pows = dom.omega_pows

        def masked_ratio(numer, denom):
            numer = jnp.where(active_mask, numer, one_t)
            denom = jnp.where(active_mask, denom, one_t)
            return FJ.mont_mul(numer, poly_device.batch_inv_dev(denom))

        def running_product(ratio, start_t):
            pre = poly_device.mont_cumprod(ratio)
            z_dev = jnp.concatenate([one_t[:, :1], pre[:, :-1]], axis=-1)
            return FJ.mont_mul(z_dev, start_t)

        zs = []
        last_z = dom.const_dev(1)  # sets chain: z_s(0) = z_{s-1}(ω^usable)
        col_idx = 0
        for s in range(nperm):
            cols = cs.permutation_columns[s * chunk : (s + 1) * chunk]
            numer = None
            denom = None
            for col in cols:
                vals = base_col(col.kind, col.index)
                sig = sigma_dev[:, col_idx]
                bd = FJ.mont_mul(beta_m, dom.const_dev(pow(DELTA, col_idx, P)))
                nt = FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(bd, omega_pows)), gamma_m)
                dt = FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(beta_m, sig)), gamma_m)
                numer = nt if numer is None else FJ.mont_mul(numer, nt)
                denom = dt if denom is None else FJ.mont_mul(denom, dt)
                col_idx += 1
            z = running_product(masked_ratio(numer, denom), last_z)
            last_z = z[:, usable : usable + 1]
            zs.append(z)

        if lk_tensors is not None:
            a_stack, s_stack, ap_stack, sp_stack = lk_tensors
            for li in range(len(cs.lookups)):
                numer = FJ.mont_mul(
                    FJ.add_mod(a_stack[:, li], beta_m),
                    FJ.add_mod(s_stack[:, li], gamma_m),
                )
                denom = FJ.mont_mul(
                    FJ.add_mod(ap_stack[:, li], beta_m),
                    FJ.add_mod(sp_stack[:, li], gamma_m),
                )
                zs.append(running_product(masked_ratio(numer, denom), dom.const_dev(1)))
        return jnp.stack(zs, axis=1)  # (16, nperm [+ nlk], n)

    @jax.jit
    def grand(advice_dev, fixed_dev, inst_dev, sigma_dev,
              a_stack, s_stack, ap_stack, sp_stack, beta_m, gamma_m):
        return _grand_core(advice_dev, fixed_dev, inst_dev, sigma_dev,
                           beta_m, gamma_m, (a_stack, s_stack, ap_stack, sp_stack))

    @jax.jit
    def grand_nolk(advice_dev, fixed_dev, inst_dev, sigma_dev, beta_m, gamma_m):
        return _grand_core(advice_dev, fixed_dev, inst_dev, sigma_dev,
                           beta_m, gamma_m, None)

    ph = _Phase23(compress, grand, grand_nolk)
    pk._phase23_cache = (dom, ph)
    return ph


def _gate_terms(cs, dom, ext_slice, theta_m, beta_m, gamma_m,
                nperm, chunk, blinders):
    """Every quotient-identity tensor (gates, permutation argument, lookup
    argument) evaluated on the extended coset grid, as labelled terms.

    ``ext_slice(name, idx)`` resolves a column group to its extended-form
    tensor — the caller decides whether that comes from one concatenated
    ``big`` tensor (batch prover, diagnostics) or from the split
    dynamic/static tensors (the pipelined single prover)."""
    last_rot = -(blinders + 1)
    one = dom.const_dev(1)

    def cdev(v):
        return dom.const_dev(v % P)

    rot_cache: dict = {}

    def rot(kind, idx, r):
        key = (kind, idx, r)
        if key not in rot_cache:
            base = ext_slice(kind, idx)
            rot_cache[key] = base if r == 0 else dom.rotate_ext(base, r)
        return rot_cache[key]

    dev_ops = {
        "constant": lambda v: cdev(v),
        "fixed": lambda q, c, r: rot("fixed", c, r),
        "advice": lambda q, c, r: rot("advice", c, r),
        "instance": lambda q, c, r: rot("instance", c, r),
        "negated": lambda a: FJ.neg_mod(a),
        "sum": lambda a, b: FJ.add_mod(a, b),
        "product": lambda a, b: FJ.mont_mul(a, b),
        "scaled": lambda a, k: FJ.mont_mul(a, cdev(k)),
        "selector": None,
    }

    l0_ext = ext_slice("special", 0)
    llast_ext = ext_slice("special", 1)
    lactive_ext = ext_slice("special", 2)
    permz_ext = [ext_slice("perm_z", s) for s in range(nperm)]

    terms = []
    for gate in cs.gates:
        for gi, polyexpr in enumerate(gate.polys):
            terms.append((f"gate:{gate.name}:{gi}", polyexpr.evaluate(dev_ops)))

    # permutation terms
    z0 = permz_ext[0]
    terms.append(("perm:l0", FJ.mont_mul(l0_ext, FJ.sub_mod(one, z0))))
    zl = permz_ext[-1]
    terms.append(
        ("perm:llast", FJ.mont_mul(llast_ext, FJ.sub_mod(FJ.mont_mul(zl, zl), zl)))
    )
    for s in range(1, nperm):
        prev_last = dom.rotate_ext(permz_ext[s - 1], last_rot)
        terms.append(
            ("perm:cont", FJ.mont_mul(l0_ext, FJ.sub_mod(permz_ext[s], prev_last)))
        )

    bx = FJ.mont_mul(beta_m, dom.x_ext)
    col_idx = 0
    for s in range(nperm):
        cols = cs.permutation_columns[s * chunk : (s + 1) * chunk]
        lhs = dom.rotate_ext(permz_ext[s], 1)
        rhs = permz_ext[s]
        for col in cols:
            vals = rot(col.kind, col.index, 0)
            sig = ext_slice("sigma", col_idx)
            lhs = FJ.mont_mul(
                lhs,
                FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(beta_m, sig)), gamma_m),
            )
            dp = cdev(pow(DELTA, col_idx, P))
            rhs = FJ.mont_mul(
                rhs, FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(dp, bx)), gamma_m)
            )
            col_idx += 1
        terms.append((f"perm:set{s}", FJ.mont_mul(FJ.sub_mod(lhs, rhs), lactive_ext)))

    # lookup terms
    for li, lk in enumerate(cs.lookups):
        z = ext_slice("lookup_z", li)
        a_p = ext_slice("lookup_a", li)
        s_p = ext_slice("lookup_s", li)
        comp_in = None
        for expr in lk.input_exprs:
            v = expr.evaluate(dev_ops)
            comp_in = (
                v if comp_in is None
                else FJ.add_mod(FJ.mont_mul(comp_in, theta_m), v)
            )
        comp_tab = None
        for expr in lk.table_exprs:
            v = expr.evaluate(dev_ops)
            comp_tab = (
                v if comp_tab is None
                else FJ.add_mod(FJ.mont_mul(comp_tab, theta_m), v)
            )
        terms.append(("lookup:l0z", FJ.mont_mul(l0_ext, FJ.sub_mod(one, z))))
        terms.append(
            ("lookup:llast", FJ.mont_mul(llast_ext, FJ.sub_mod(FJ.mont_mul(z, z), z)))
        )
        lhs = FJ.mont_mul(
            dom.rotate_ext(z, 1),
            FJ.mont_mul(FJ.add_mod(a_p, beta_m), FJ.add_mod(s_p, gamma_m)),
        )
        rhs = FJ.mont_mul(
            z,
            FJ.mont_mul(FJ.add_mod(comp_in, beta_m), FJ.add_mod(comp_tab, gamma_m)),
        )
        terms.append(("lookup:main", FJ.mont_mul(lactive_ext, FJ.sub_mod(lhs, rhs))))
        diff = FJ.sub_mod(a_p, s_p)
        terms.append(("lookup:l0as", FJ.mont_mul(l0_ext, diff)))
        a_prev = dom.rotate_ext(a_p, -1)
        terms.append(
            ("lookup:shuffle", FJ.mont_mul(
                lactive_ext, FJ.mont_mul(diff, FJ.sub_mod(a_p, a_prev))
            ))
        )
    return terms


def _fold_terms(dom, terms, y_m):
    """y-Horner fold of the quotient identities, vanishing division, and the
    iNTT back to coefficient form → h(X) coefficients (16, n_ext)."""
    numer = None
    for _, term in terms:
        term = jnp.broadcast_to(term, (16, dom.n_ext)).astype(jnp.uint32)
        numer = term if numer is None else FJ.add_mod(FJ.mont_mul(numer, y_m), term)
    h_ext = dom.divide_by_vanishing(numer)
    return dom.extended_to_coeff(h_ext)


def _quotient_fn(pk, cs, dom, offsets, nperm, chunk, blinders):
    """Quotient-phase evaluator over ONE concatenated ``big`` tensor:
    batched iNTT + coset NTT + every identity + y-fold + vanishing division
    in one jitted device function (used by the batch prover and the
    MockProver-style diagnostics; the single prover uses the pipelined
    split path, ``_split_quotient_fns``).

    Cached on the proving key; rebuilt only if the (pk, domain) pair
    changes. The returned callable maps
    ``(big, θ, β, γ, y) -> (big_coeff, h_coeff)``; ``.eager`` runs the same
    trace un-jitted and additionally returns the labelled per-identity
    tensors for the MockProver-style diagnostics path.
    """
    okey = (id(dom),) + tuple(sorted(offsets.items()))
    cached = pk.__dict__.get("_quotient_fn_cache")
    if cached is not None and cached[0] == okey:
        return cached[1]

    import jax

    def build(big, theta_m, beta_m, gamma_m, y_m):
        big_coeff = dom.lagrange_to_coeff(big)
        big_ext = dom.coeff_to_extended(big_coeff)

        def ext_slice(name, idx):
            return big_ext[:, offsets[name] + idx]

        terms = _gate_terms(cs, dom, ext_slice, theta_m, beta_m, gamma_m,
                            nperm, chunk, blinders)
        h_coeff = _fold_terms(dom, terms, y_m)  # (16, n_ext)
        return big_coeff, h_coeff, terms

    jitted = jax.jit(lambda *a: build(*a)[:2])

    def call(*a):
        return jitted(*a)

    call.eager = build
    pk._quotient_fn_cache = (okey, call)
    return call


_chunk_tfn_cache: dict = {}


def _chunk_tfn(dom):
    """Jitted single-chunk Lagrange → (coeff, extended) transform."""
    fn = _chunk_tfn_cache.get(id(dom))
    if fn is None:
        import jax

        @jax.jit
        def fn(sl):
            c = dom.lagrange_to_coeff(sl)
            return c, dom.coeff_to_extended(c)

        _chunk_tfn_cache[id(dom)] = fn
    return fn


def transform_cols(dom, lagr):
    """Lagrange → (coeff, extended) forms with a per-dispatch column
    budget: the four-step NTT's intermediates cost ~1.7 GB per column at
    k=17 (n_ext = 2^19), and transforming all ~15 static columns in one
    jit compiled to a 24.9 GB program — over the v5e's 16 GB HBM. Columns
    are transformed in HBM-capped slices (budget lanes / n_ext, override
    with CIRCUITS_TRANSFORM_LANE_BUDGET) and concatenated on device."""
    ncols = int(lagr.shape[1])
    budget = max(
        1,
        int(os.environ.get("CIRCUITS_TRANSFORM_LANE_BUDGET", 1 << 21))
        // dom.n_ext,
    )
    if ncols <= budget:
        return _chunk_tfn(dom)(lagr)
    fn = _chunk_tfn(dom)
    cs_, es_ = [], []
    for lo in range(0, ncols, budget):
        c, e = fn(lagr[:, lo : lo + budget])
        cs_.append(c)
        es_.append(e)
    return jnp.concatenate(cs_, axis=1), jnp.concatenate(es_, axis=1)


def _static_transform(pk, cs, dom, usable):
    """Coefficient + extended forms of the proof-independent columns
    (fixed, sigma, L0/L_last/L_active), computed ONCE per proving key and
    reused by every proof — these never change between proofs, so
    re-transforming them per proof (as the one-big-tensor path does) is
    pure waste. Returns (st_coeff, st_ext, st_offsets)."""
    cached = pk.__dict__.get("_static_transform_cache")
    if cached is not None and cached[0] is dom:
        return cached[1]

    vk = pk.vk
    n = dom.n
    l0_vals = [0] * n
    l0_vals[0] = 1
    llast_vals = [0] * n
    llast_vals[usable] = 1
    lactive_vals = [1 if r < usable else 0 for r in range(n)]

    fixed_dev = dom.cols_to_device(vk.fixed_values)
    sigma_dev = dom.cols_to_device(vk.sigma_values)
    special = dom.cols_to_device([l0_vals, llast_vals, lactive_vals])
    st_offsets = {
        "fixed": 0,
        "sigma": fixed_dev.shape[1],
        "special": fixed_dev.shape[1] + sigma_dev.shape[1],
    }
    st_lagr = jnp.concatenate([fixed_dev, sigma_dev, special], axis=1)
    st_coeff, st_ext = transform_cols(dom, st_lagr)
    out = (st_coeff, st_ext, st_offsets)
    pk._static_transform_cache = (dom, out)
    return out


def _split_quotient_fns(pk, cs, dom, dyn_offsets, st_offsets, nperm, chunk,
                        blinders):
    """Pipelined quotient phase (SURVEY §2c axis 4), two jitted pieces:

    - ``transform(big_dyn) -> (dyn_coeff, dyn_ext)``: the challenge-
      independent batched iNTT + coset NTT of the per-proof columns. The
      prover dispatches this BEFORE materializing the phase-3 commitments,
      so the device overlaps it with the host's transcript round-trip.
    - ``gates(dyn_ext, st_ext, θ, β, γ, y) -> h_coeff``: identity
      evaluation + y-fold + vanishing division, dispatched once y is known.

    Cached on the proving key per (domain, column layout) — the gates()
    closure bakes in the offset dicts, so a caller with a different layout
    on the same pk/domain must not hit a stale entry."""
    cache_key = (
        id(dom),
        tuple(sorted(dyn_offsets.items())),
        tuple(sorted(st_offsets.items())),
    )
    cached = pk.__dict__.get("_split_quotient_cache")
    if cached is not None and cached[0] == cache_key:
        return cached[1]

    import jax

    def transform(big_dyn):
        # HBM-capped chunked dispatches (see transform_cols)
        return transform_cols(dom, big_dyn)

    @jax.jit
    def transform_whole(big_dyn):
        # single-jit form for the batch prover's vmap (k=11-scale batches)
        dyn_coeff = dom.lagrange_to_coeff(big_dyn)
        return dyn_coeff, dom.coeff_to_extended(dyn_coeff)

    transform.whole = transform_whole

    @jax.jit
    def gates(dyn_ext, st_ext, theta_m, beta_m, gamma_m, y_m):
        def ext_slice(name, idx):
            if name in st_offsets:
                return st_ext[:, st_offsets[name] + idx]
            return dyn_ext[:, dyn_offsets[name] + idx]

        terms = _gate_terms(cs, dom, ext_slice, theta_m, beta_m, gamma_m,
                            nperm, chunk, blinders)
        return _fold_terms(dom, terms, y_m)

    out = (transform, gates)
    pk._split_quotient_cache = (cache_key, out)
    return out


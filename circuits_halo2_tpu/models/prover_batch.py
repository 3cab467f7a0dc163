"""Cross-user batched proving (vmapped phase evaluators).

A CEX produces one MstInclusion proof per user (reference flow:
`backend/src/apis/round.rs:112-123` calls the prover once per user); the
proofs are independent, so the heavy device work batches. This module
proves U users in ONE pass: every jitted phase evaluator from
models/prover (lookup compression, grand products, the quotient, the
evaluation sweep, both SHPLONK folds) is wrapped in ``jax.vmap`` over a
user axis, and every commitment MSM runs as one batched Pippenger dispatch
over all users' columns. Per-user work that is inherently sequential — the
Fiat–Shamir transcript, the lookup permute sort, blinding draws, the ≤3-
point r_j interpolations — stays host-side in plain Python loops, exactly
as in the single-user prover.

**Measured caveat (round 5, v5e, k=11): batching does NOT pay at current
scales.** Warm sequential proving runs 26.4 proofs/min; the vmapped batch
runs 17.9/min at U=8 and 13.3/min at U=32 (all proofs verify in both
paths). The single-user jitted graphs are already device-efficient at
n=2048 rows, and the vmapped versions lower to slower code (vmapped
gathers/scans fuse worse) without reducing the serialized host work. Use
the sequential loop for throughput at k≤13; this path remains correct
(byte-identical proofs, tested) and is the right structure if per-proof
device work ever shrinks below dispatch overheads (e.g. much smaller
circuits or multi-proof hardware queues).

Byte-compatibility: ``prove_batch(params, pk, [c], ...)[0]`` is guaranteed
byte-identical to ``prove(params, pk, c, ...)`` — same blinding-draw
order per user, same transcript framing (tests/test_prover_batch.py).

Sharding note: batch proving targets single-device throughput; an active
prover mesh (parallel/auto) is suspended for the duration of the batch
(shard_map inside vmap is not a supported composition) and restored after.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import msm as MSM
from ..utils import poly_device
from ..utils.srs import ParamsKZG
from ..utils.transcript import KeccakTranscript
from .assignment import Assignment
from .keygen import ProvingKey
from .prover import (
    BlindingRng,
    _phase23_fns,
    _phase56_fns,
    _split_quotient_fns,
    _static_transform,
)
from .verifier import num_perm_sets, perm_chunk_len, rotation_sets

P = F.FR_MOD


def _batched_fns(pk, cs, dom, usable, nperm, chunk, blinders, offsets,
                 dyn_offsets, st_offsets, num_h, sets, nusers: int,
                 has_lookups: bool):
    """vmapped wrappers of the single-user jitted phase evaluators, cached
    per (domain, U). User axis is position 1 (after the limb axis) on every
    per-user tensor; fixed/sigma/special columns are shared across users
    (in_axes=None — transformed once per pk by _static_transform, never
    per user)."""
    cache = pk.__dict__.setdefault("_batch_fns_cache", {})
    key = (id(dom), nusers)
    if key in cache:
        return cache[key]

    ph = _phase23_fns(pk, cs, dom, usable, nperm, chunk)
    p56 = _phase56_fns(pk, cs, dom, offsets, num_h, sets)
    tfn, gfn = _split_quotient_fns(
        pk, cs, dom, dyn_offsets, st_offsets, nperm, chunk, blinders)

    out = {}
    if has_lookups:
        out["compress"] = jax.jit(jax.vmap(
            ph.compress, in_axes=(1, None, 1, 1), out_axes=1))
        out["grand"] = jax.jit(jax.vmap(
            ph.grand, in_axes=(1, None, 1, None, 1, 1, 1, 1, 1, 1),
            out_axes=1))
    else:
        out["grand_nolk"] = jax.jit(jax.vmap(
            ph.grand_nolk, in_axes=(1, None, 1, None, 1, 1), out_axes=1))
    out["transform"] = jax.jit(jax.vmap(tfn.whole, in_axes=1, out_axes=(1, 1)))
    out["gates"] = jax.jit(jax.vmap(
        gfn, in_axes=(1, None, 1, 1, 1, 1), out_axes=1))
    out["eval_all"] = jax.jit(jax.vmap(
        p56.eval_all, in_axes=(1, 1, 1, 1, 1), out_axes=(1, 1, 1, 0)))

    _open_w_cache: dict = {}

    def _open_w(big_coeff, h_coeff, random_dev, xn, zeta, nu, r_t, pts, ipts,
                set_pt_idx):
        # jitted per set/point-index structure (static arg of open_w);
        # cached so repeat batches reuse the compiled executable
        fn = _open_w_cache.get(set_pt_idx)
        if fn is None:
            fn = jax.jit(jax.vmap(
                lambda *a: p56.open_w(*a, set_pt_idx),
                in_axes=(1,) * 9, out_axes=(1, 1)))
            _open_w_cache[set_pt_idx] = fn
        return fn(big_coeff, h_coeff, random_dev, xn, zeta, nu, r_t, pts, ipts)

    out["open_w"] = _open_w
    out["open_wprime"] = jax.jit(jax.vmap(
        p56.open_wprime, in_axes=(1,) * 7, out_axes=1))
    cache[key] = out
    return out


def prove_batch(
    params: ParamsKZG,
    pk: ProvingKey,
    circuits: list,
    config,
    instances_list: list[list[list[int]]],
    rngs: list[BlindingRng] | None = None,
    transcript_cls=KeccakTranscript,
    vk_digest: int | None = None,
) -> list[bytes]:
    """Prove U independent circuits in one batched device pass.

    Returns one proof (bytes) per circuit, each byte-identical to what
    ``prover.prove`` produces for that circuit with the same rng."""
    from ..parallel import auto as _auto

    nu_users = len(circuits)
    assert nu_users == len(instances_list) and nu_users > 0
    rngs = rngs or [BlindingRng() for _ in range(nu_users)]

    saved_mesh = _auto.get_mesh()
    if saved_mesh is not None:
        _auto.set_mesh(None)
    try:
        return _prove_batch_inner(
            params, pk, circuits, config, instances_list, rngs,
            transcript_cls, vk_digest)
    finally:
        if saved_mesh is not None:
            _auto.set_mesh(saved_mesh)


def _prove_batch_inner(params, pk, circuits, config, instances_list, rngs,
                       transcript_cls, vk_digest):
    U = len(circuits)
    vk = pk.vk
    cs = vk.cs
    n = 1 << vk.k
    omega = vk.omega
    blinders = cs.blinding_factors()
    usable = n - (blinders + 1)
    nperm = num_perm_sets(cs)
    chunk = perm_chunk_len(cs)
    dom = poly_device.domain(vk.k, cs.degree())
    nlk = len(cs.lookups)

    sets = rotation_sets(cs)
    num_h = cs.degree() - 1

    # transcripts
    ts = []
    for u in range(U):
        t = transcript_cls()
        t.common_scalar(vk_digest if vk_digest is not None else vk.transcript_repr)
        for col in instances_list[u]:
            for v in col:
                t.common_scalar(v)
        ts.append(t)

    # ---- phase 1: witness synthesis + advice commitments ------------------
    advice_stack = []   # per user (16, A, n)
    inst_stack = []
    for u in range(U):
        asn = Assignment(cs, n, instances_list[u])
        circuits[u].synthesize(config, asn)
        advice = [list(col) for col in asn.advice]
        for col in advice:
            for row in range(usable, n):
                col[row] = rngs[u].next_field()
        advice_stack.append(dom.cols_to_device(advice))
        inst_stack.append(dom.cols_to_device([list(c) for c in asn.instance]))
    advice_dev = jnp.stack(advice_stack, axis=1)   # (16, U, A, n)
    inst_dev = jnp.stack(inst_stack, axis=1)
    fixed_dev = dom.cols_to_device(vk.fixed_values)
    sigma_dev = dom.cols_to_device(vk.sigma_values)

    n_adv = advice_dev.shape[2]
    pts = MSM.msm_commit_dev(
        params.g_lagrange, advice_dev.reshape(16, U * n_adv, n))
    thetas = []
    for u in range(U):
        for pt in pts[u * n_adv : (u + 1) * n_adv]:
            ts[u].write_point(pt)
        thetas.append(ts[u].squeeze_challenge())

    # offsets mirror prover.prove's split layout: dynamic (per-user) groups
    # first, then the shared static groups from the per-pk transform cache
    st_coeff, st_ext, st_offsets = _static_transform(pk, cs, dom, usable)
    dyn_offsets = {}
    ptr = 0
    dyn_sizes = [("advice", n_adv), ("instance", inst_dev.shape[2]),
                 ("perm_z", nperm)]
    if nlk:
        dyn_sizes += [("lookup_z", nlk), ("lookup_a", nlk), ("lookup_s", nlk)]
    for name, size in dyn_sizes:
        dyn_offsets[name] = ptr
        ptr += size
    offsets = dict(dyn_offsets)
    for name, off in st_offsets.items():
        offsets[name] = ptr + off

    fns = _batched_fns(pk, cs, dom, usable, nperm, chunk, blinders, offsets,
                       dyn_offsets, st_offsets, num_h, sets, U, bool(nlk))

    theta_m = jnp.stack([dom.to_device([th]) for th in thetas], axis=1)  # (16,U,1)

    # ---- phase 2: permuted lookup columns ---------------------------------
    a_stack = s_stack = ap_stack = sp_stack = None
    if nlk:
        a_stack, s_stack = fns["compress"](advice_dev, fixed_dev, inst_dev,
                                           theta_m)  # (16, U, nlk, n)
        flat = dom.from_device(
            jnp.concatenate([a_stack, s_stack], axis=2).reshape(16, -1))
        stride = 2 * nlk * n
        ap_cols, sp_cols = [], []
        for u in range(U):
            base = u * stride
            for li in range(nlk):
                a_comp = flat[base + li * n : base + (li + 1) * n]
                s_comp = flat[base + (nlk + li) * n : base + (nlk + li + 1) * n]
                a_perm = sorted(a_comp[:usable])
                table_counts: dict[int, int] = {}
                for v in s_comp[:usable]:
                    table_counts[v] = table_counts.get(v, 0) + 1
                s_perm = [0] * usable
                repeated = []
                for row, v in enumerate(a_perm):
                    if row == 0 or v != a_perm[row - 1]:
                        s_perm[row] = v
                        cnt = table_counts.get(v, 0)
                        assert cnt > 0, "lookup input value not in table"
                        table_counts[v] = cnt - 1
                    else:
                        repeated.append(row)
                for v in sorted(table_counts):
                    for _ in range(table_counts[v]):
                        s_perm[repeated.pop()] = v
                assert not repeated
                a_perm += [rngs[u].next_field() for _ in range(blinders + 1)]
                s_perm += [rngs[u].next_field() for _ in range(blinders + 1)]
                ap_cols.append(a_perm)
                sp_cols.append(s_perm)
        ap_all = dom.cols_to_device(ap_cols).reshape(16, U, nlk, n)
        sp_all = dom.cols_to_device(sp_cols).reshape(16, U, nlk, n)
        ap_stack, sp_stack = ap_all, sp_all
        inter = jnp.stack(
            [c for u in range(U) for li in range(nlk)
             for c in (ap_all[:, u, li], sp_all[:, u, li])], axis=1)
        ipts = MSM.msm_commit_dev(params.g_lagrange, inter)
        for u in range(U):
            for pt in ipts[u * 2 * nlk : (u + 1) * 2 * nlk]:
                ts[u].write_point(pt)

    betas, gammas = [], []
    for u in range(U):
        betas.append(ts[u].squeeze_challenge())
        gammas.append(ts[u].squeeze_challenge())
    beta_m = jnp.stack([dom.to_device([b]) for b in betas], axis=1)
    gamma_m = jnp.stack([dom.to_device([g]) for g in gammas], axis=1)

    # ---- phase 3: grand products + random polys ---------------------------
    if nlk:
        z_stack = fns["grand"](advice_dev, fixed_dev, inst_dev, sigma_dev,
                               a_stack, s_stack, ap_stack, sp_stack,
                               beta_m, gamma_m)  # (16, U, nz, n)
    else:
        z_stack = fns["grand_nolk"](advice_dev, fixed_dev, inst_dev,
                                    sigma_dev, beta_m, gamma_m)
    nz = nperm + nlk
    blind_cols = [
        [rngs[u].next_field() for _ in range(blinders)]
        for u in range(U) for _ in range(nz)
    ]
    z_stack = jnp.concatenate(
        [z_stack[..., : usable + 1],
         dom.cols_to_device(blind_cols).reshape(16, U, nz, blinders)],
        axis=-1)

    finish_z = MSM.msm_commit_dev_async(
        params.g_lagrange, z_stack.reshape(16, U * nz, n))
    random_cols = [[rngs[u].next_field() for _ in range(n)] for u in range(U)]
    random_dev = dom.cols_to_device(random_cols)  # (16, U, n) coefficient form
    finish_r = MSM.msm_commit_dev_async(params.g, random_dev)

    # ---- pipelined batched transforms (challenge-independent) -------------
    # dispatched before the phase-3 commitments are pulled, like the single
    # prover; static columns come transformed from the per-pk cache
    group_tensors = [advice_dev, inst_dev, z_stack[:, :, :nperm]]
    if nlk:
        group_tensors += [z_stack[:, :, nperm:], ap_stack, sp_stack]
    big_dyn = jnp.concatenate(group_tensors, axis=2)  # (16, U, B_dyn, n)
    dyn_coeff, dyn_ext = fns["transform"](big_dyn)

    zpts = finish_z()
    rpts = finish_r()
    ys = []
    for u in range(U):
        for pt in zpts[u * nz : (u + 1) * nz]:
            ts[u].write_point(pt)
        ts[u].write_point(rpts[u])
        ys.append(ts[u].squeeze_challenge())
    y_m = jnp.stack([dom.to_device([y]) for y in ys], axis=1)

    # ---- phase 4: quotient ------------------------------------------------
    h_coeff_dev = fns["gates"](dyn_ext, st_ext, theta_m, beta_m, gamma_m, y_m)
    big_coeff = jnp.concatenate(
        [dyn_coeff,
         jnp.broadcast_to(
             st_coeff[:, None], (16, U) + st_coeff.shape[1:]
         ).astype(jnp.uint32)],
        axis=2,
    )  # (16, U, B, n) in the split offsets layout

    hpts = MSM.msm_commit_dev(
        params.g, h_coeff_dev[:, :, : num_h * n].reshape(16, U * num_h, n))
    xs = []
    for u in range(U):
        for pt in hpts[u * num_h : (u + 1) * num_h]:
            ts[u].write_point(pt)
        xs.append(ts[u].squeeze_challenge())

    # ---- phase 5: evaluations ---------------------------------------------
    omega_inv = F.fr_inv(omega)
    per_user = []
    pts_rows, xn_rows = [], []
    for u in range(U):
        x = xs[u]
        x_next = x * omega % P
        x_prev = x * omega_inv % P
        x_last = x * F.fr_pow(omega_inv, blinders + 1) % P
        x_n = F.fr_pow(x, n)
        point_of = {}
        for rots, _ in sets:
            for r in rots:
                point_of.setdefault(r, x * F.fr_pow(omega, r % n) % P)
        pt_idx: dict[int, int] = {}
        for p in [x, x_next, x_prev, x_last, *point_of.values()]:
            pt_idx.setdefault(p, len(pt_idx))
        for col, rot_i in cs.advice_queries + cs.fixed_queries:
            pt_idx.setdefault(x * F.fr_pow(omega, rot_i % n) % P, len(pt_idx))
        points = list(pt_idx)
        xn_pows = [F.fr_pow(x_n, i) for i in range(num_h)]
        per_user.append(dict(x=x, x_next=x_next, x_prev=x_prev, x_last=x_last,
                             point_of=point_of, pt_idx=pt_idx, points=points))
        pts_rows.append(points)
        xn_rows.append(xn_pows)
    npts = len(pts_rows[0])
    assert all(len(r) == npts for r in pts_rows), "opening-point collision"
    pts_m = jnp.stack([dom.to_device(r) for r in pts_rows], axis=1)
    xn_m = jnp.stack([dom.to_device(r) for r in xn_rows], axis=1)

    evs_dev, rand_evals, quot_evals, tails = fns["eval_all"](
        big_coeff, h_coeff_dev, random_dev, xn_m, pts_m)
    assert bool(jnp.all(tails)), "quotient degree overflow"
    ncols_total = evs_dev.shape[2]
    allv = dom.from_device(jnp.concatenate(
        [evs_dev.reshape(16, U, -1), rand_evals, quot_evals], axis=2
    ).reshape(16, -1))
    ustride = (ncols_total + 2) * npts

    zetas, nus = [], []
    for u in range(U):
        st = per_user[u]
        pt_idx = st["pt_idx"]
        base = u * ustride

        def ev(name, idx, point):
            return allv[base + (offsets[name] + idx) * npts + pt_idx[point]]

        st["ev"] = ev
        st["random_eval"] = lambda point, b=base, pi=pt_idx: allv[
            b + ncols_total * npts + pi[point]]
        st["quotient_eval"] = lambda point, b=base, pi=pt_idx: allv[
            b + (ncols_total + 1) * npts + pi[point]]

        t, x = ts[u], st["x"]
        for col, rot_i in cs.advice_queries:
            t.write_scalar(ev("advice", col, x * F.fr_pow(omega, rot_i % n) % P))
        for col, rot_i in cs.fixed_queries:
            t.write_scalar(ev("fixed", col, x * F.fr_pow(omega, rot_i % n) % P))
        t.write_scalar(st["random_eval"](x))
        for i in range(len(cs.permutation_columns)):
            t.write_scalar(ev("sigma", i, x))
        for s in range(nperm):
            t.write_scalar(ev("perm_z", s, x))
            t.write_scalar(ev("perm_z", s, st["x_next"]))
            if s < nperm - 1:
                t.write_scalar(ev("perm_z", s, st["x_last"]))
        for li in range(nlk):
            t.write_scalar(ev("lookup_z", li, x))
            t.write_scalar(ev("lookup_z", li, st["x_next"]))
            t.write_scalar(ev("lookup_a", li, x))
            t.write_scalar(ev("lookup_a", li, st["x_prev"]))
            t.write_scalar(ev("lookup_s", li, x))
        zetas.append(t.squeeze_challenge())
        nus.append(t.squeeze_challenge())

    # ---- phase 6: SHPLONK multiopen ---------------------------------------
    max_polys = max(len(polys) for _, polys in sets)
    max_rots = max(len(rots) for rots, _ in sets)
    zeta_rows, nu_rows, r_rows_u, ipts_rows = [], [], [], []
    set_pt_idx = None
    for u in range(U):
        st = per_user[u]
        point_of, pt_idx = st["point_of"], st["pt_idx"]
        zeta_pows = [pow(zetas[u], i, P) for i in range(max_polys)]
        nu_pows = [pow(nus[u], j, P) for j in range(len(sets))]

        def poly_eval_at(poly, point):
            kind = poly[0]
            if kind == "quotient":
                return st["quotient_eval"](point)
            if kind == "random":
                return st["random_eval"](point)
            return st["ev"](kind, poly[1], point)

        set_evals = []
        r_rows = []
        for rots, polys in sets:
            pts_j = [point_of[r] for r in rots]
            evals = [0] * len(rots)
            for i, poly in enumerate(polys):
                for ri, r in enumerate(rots):
                    evals[ri] = (
                        evals[ri] + zeta_pows[i] * poly_eval_at(poly, point_of[r])
                    ) % P
            set_evals.append(evals)
            r_coeffs = [0] * len(pts_j)
            for i, (pt, ev_i) in enumerate(zip(pts_j, evals)):
                basis = [1]
                denom = 1
                for jj, other in enumerate(pts_j):
                    if jj == i:
                        continue
                    basis = [
                        ((basis[kk - 1] if kk > 0 else 0)
                         - other * (basis[kk] if kk < len(basis) else 0)) % P
                        for kk in range(len(basis) + 1)
                    ]
                    denom = denom * (pt - other) % P
                scale = ev_i * F.fr_inv(denom) % P
                for kk, b in enumerate(basis):
                    r_coeffs[kk] = (r_coeffs[kk] + scale * b) % P
            r_rows.append(r_coeffs + [0] * (max_rots - len(r_coeffs)))
        st["set_evals"] = set_evals
        st["zeta_pows"] = zeta_pows
        st["nu_pows"] = nu_pows
        zeta_rows.append(zeta_pows)
        nu_rows.append(nu_pows)
        r_rows_u.append(r_rows)
        ipts_rows.append([pow(p, -1, P) for p in st["points"]])
        spi = tuple(tuple(pt_idx[point_of[r]] for r in rots)
                    for rots, _ in sets)
        if set_pt_idx is None:
            set_pt_idx = spi
        else:
            assert spi == set_pt_idx, "set/point structure diverged across users"

    zeta_m = jnp.stack([dom.to_device(r) for r in zeta_rows], axis=1)
    nu_m = jnp.stack([dom.to_device(r) for r in nu_rows], axis=1)
    r_m = jnp.stack([dom.cols_to_device(r) for r in r_rows_u], axis=1)
    ipts_m = jnp.stack([dom.to_device(r) for r in ipts_rows], axis=1)

    h_x_dev, f_stack = fns["open_w"](
        big_coeff, h_coeff_dev, random_dev, xn_m, zeta_m, nu_m, r_m,
        pts_m, ipts_m, set_pt_idx)
    wpts = MSM.msm_commit_dev(params.g, h_x_dev)
    mus = []
    for u in range(U):
        ts[u].write_point(wpts[u])
        mus.append(ts[u].squeeze_challenge())

    coeffs_rows, z0_rows, rmu_rows, mu_rows, imu_rows = [], [], [], [], []
    for u in range(U):
        st = per_user[u]
        mu = mus[u]
        point_of = st["point_of"]
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
            r_mu = 0
            for i, (pt, ev_i) in enumerate(zip(pts_j, st["set_evals"][j])):
                li = 1
                for jj, other in enumerate(pts_j):
                    if jj != i:
                        li = li * ((mu - other) * F.fr_inv((pt - other) % P) % P) % P
                r_mu = (r_mu + ev_i * li) % P
            coeff = st["nu_pows"][j] * norm % P
            total_rmu = (total_rmu + coeff * r_mu) % P
            coeffs.append(coeff)
        coeffs_rows.append(coeffs)
        z0_rows.append([z0_mu])
        rmu_rows.append([total_rmu])
        mu_rows.append([mu])
        imu_rows.append([pow(mu, -1, P)])

    w_prime_dev = fns["open_wprime"](
        f_stack, h_x_dev,
        jnp.stack([dom.to_device(r) for r in coeffs_rows], axis=1),
        jnp.stack([dom.to_device(r) for r in z0_rows], axis=1),
        jnp.stack([dom.to_device(r) for r in rmu_rows], axis=1),
        jnp.stack([dom.to_device(r) for r in mu_rows], axis=1),
        jnp.stack([dom.to_device(r) for r in imu_rows], axis=1))
    wppts = MSM.msm_commit_dev(params.g, w_prime_dev)
    proofs = []
    for u in range(U):
        ts[u].write_point(wppts[u])
        proofs.append(ts[u].finalize())
    return proofs

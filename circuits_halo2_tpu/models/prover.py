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

    dom = poly_device.Domain(vk.k, cs.degree())
    PD = poly_device

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

    for pt in MSM.msm_auto_batch(params.g_lagrange, advice):
        t.write_point(pt)
    theta = t.squeeze_challenge()

    # device Lagrange tensors (base domain) for every committed column
    advice_dev = dom.cols_to_device(advice)
    fixed_dev = dom.cols_to_device(fixed)
    inst_dev = dom.cols_to_device(instance_vals)
    sigma_dev = dom.cols_to_device(vk.sigma_values)

    def base_col(kind: str, idx: int):
        return {"advice": advice_dev, "fixed": fixed_dev,
                "instance": inst_dev}[kind][:, idx]

    base_ops = {
        "constant": lambda v: dom.const_dev(v % P),
        "fixed": lambda q, c, r: dom.rotate_base(base_col("fixed", c), r),
        "advice": lambda q, c, r: dom.rotate_base(base_col("advice", c), r),
        "instance": lambda q, c, r: dom.rotate_base(base_col("instance", c), r),
        "negated": lambda a: FJ.neg_mod(a),
        "sum": lambda a, b: FJ.add_mod(a, b),
        "product": lambda a, b: FJ.mont_mul(a, b),
        "scaled": lambda a, k: FJ.mont_mul(a, dom.const_dev(k % P)),
        "selector": None,
    }
    theta_d = dom.const_dev(theta)

    def compress(exprs):
        acc = None
        for expr in exprs:
            v = jnp.broadcast_to(expr.evaluate(base_ops), (16, n)).astype(jnp.uint32)
            acc = v if acc is None else FJ.add_mod(FJ.mont_mul(acc, theta_d), v)
        return acc

    # ---- phase 2: permuted lookup columns ---------------------------------
    lookups = []
    for lk in cs.lookups:
        a_dev = compress(lk.input_exprs)
        s_dev = compress(lk.table_exprs)
        a_comp = dom.from_device(a_dev)
        s_comp = dom.from_device(s_dev)

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
    lk_rows = [c for lk in lookups for c in (lk["a_perm"], lk["s_perm"])]
    if lk_rows:
        for pt in MSM.msm_auto_batch(params.g_lagrange, lk_rows):
            t.write_point(pt)

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()

    # ---- phase 3: grand products + random poly ----------------------------
    beta_d = dom.const_dev(beta)
    gamma_d = dom.const_dev(gamma)
    one_t = jnp.broadcast_to(dom.const_dev(1), (16, n)).astype(jnp.uint32)
    active_mask = jnp.arange(n) < usable
    omega_pows = dom.omega_pows

    def masked_ratio(numer, denom):
        """Π-ratio per active row; inactive lanes → 1 (keeps cumprod and
        batched inversion clean)."""
        numer = jnp.where(active_mask, numer, one_t)
        denom = jnp.where(active_mask, denom, one_t)
        return FJ.mont_mul(numer, PD.batch_inv_dev(denom))

    def running_product(ratio, start: int):
        """z[0]=start, z[i]=start·Π_{j<i} ratio_j (device log-depth scan)."""
        pre = PD.mont_cumprod(ratio)
        z_dev = jnp.concatenate([one_t[:, :1], pre[:, :-1]], axis=-1)
        return FJ.mont_mul(z_dev, dom.const_dev(start))

    perm_zs = []
    last_z = 1  # sets chain: z_s(0) = z_{s-1}(omega^usable)
    col_idx = 0
    for s in range(nperm):
        cols = cs.permutation_columns[s * chunk : (s + 1) * chunk]
        numer = None
        denom = None
        for col in cols:
            vals = base_col(col.kind, col.index)
            sig = sigma_dev[:, col_idx]
            bd = dom.const_dev(beta * pow(DELTA, col_idx, P) % P)
            nt = FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(bd, omega_pows)), gamma_d)
            dt = FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(beta_d, sig)), gamma_d)
            numer = nt if numer is None else FJ.mont_mul(numer, nt)
            denom = dt if denom is None else FJ.mont_mul(denom, dt)
            col_idx += 1
        z = dom.from_device(running_product(masked_ratio(numer, denom), last_z))
        last_z = z[usable]
        for row in range(usable + 1, n):
            z[row] = rng.next_field()
        perm_zs.append(z)

    lookup_zs = []
    for lk in lookups:
        ap_dev = dom.to_device(lk["a_perm"])
        sp_dev = dom.to_device(lk["s_perm"])
        lk["ap_dev"] = ap_dev
        lk["sp_dev"] = sp_dev
        numer = FJ.mont_mul(
            FJ.add_mod(lk["a_dev"], beta_d), FJ.add_mod(lk["s_dev"], gamma_d)
        )
        denom = FJ.mont_mul(
            FJ.add_mod(ap_dev, beta_d), FJ.add_mod(sp_dev, gamma_d)
        )
        z = dom.from_device(running_product(masked_ratio(numer, denom), 1))
        for row in range(usable + 1, n):
            z[row] = rng.next_field()
        lookup_zs.append(z)

    for pt in MSM.msm_auto_batch(params.g_lagrange, perm_zs + lookup_zs):
        t.write_point(pt)

    random_poly = [rng.next_field() for _ in range(n)]
    t.write_point(MSM.msm_auto(params.g, random_poly))
    y = t.squeeze_challenge()

    # ---- batched Lagrange → coeff → extended transforms -------------------
    # One concatenated (16, B, n) tensor; ONE batched iNTT gives every
    # coefficient form (reused by phases 5/6), one batched coset-NTT gives
    # every extended form (phase 4).
    l0_vals = [0] * n
    l0_vals[0] = 1
    llast_vals = [0] * n
    llast_vals[usable] = 1
    lactive_vals = [1 if r < usable else 0 for r in range(n)]

    group_tensors = [advice_dev, fixed_dev, inst_dev, sigma_dev]
    group_names = ["advice", "fixed", "instance", "sigma"]
    group_tensors.append(dom.cols_to_device(perm_zs))
    group_names.append("perm_z")
    if lookups:
        group_tensors.append(dom.cols_to_device(lookup_zs))
        group_names.append("lookup_z")
        group_tensors.append(
            jnp.stack([lk["ap_dev"] for lk in lookups], axis=1)
        )
        group_names.append("lookup_a")
        group_tensors.append(
            jnp.stack([lk["sp_dev"] for lk in lookups], axis=1)
        )
        group_names.append("lookup_s")
    group_tensors.append(dom.cols_to_device([l0_vals, llast_vals, lactive_vals]))
    group_names.append("special")

    offsets = {}
    ptr = 0
    for name, tensor in zip(group_names, group_tensors):
        offsets[name] = ptr
        ptr += tensor.shape[1]
    big = jnp.concatenate(group_tensors, axis=1)  # (16, B, n)
    big_coeff = dom.lagrange_to_coeff(big)
    big_ext = dom.coeff_to_extended(big_coeff)

    def coeff_slice(name, idx):
        return big_coeff[:, offsets[name] + idx]

    def ext_slice(name, idx):
        return big_ext[:, offsets[name] + idx]

    # ---- phase 4: quotient on the extended domain -------------------------
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
    terms.append(("perm:llast", FJ.mont_mul(llast_ext, FJ.sub_mod(FJ.mont_mul(zl, zl), zl))))
    last_rot = -(blinders + 1)
    for s in range(1, nperm):
        prev_last = dom.rotate_ext(permz_ext[s - 1], last_rot)
        terms.append(("perm:cont", FJ.mont_mul(l0_ext, FJ.sub_mod(permz_ext[s], prev_last))))
    beta_d = cdev(beta)
    gamma_d = cdev(gamma)

    # identity polynomial X on the extended coset grid
    g = poly_device.COSET_GEN
    pts = [0] * dom.n_ext
    acc = g
    w = dom.omega_ext
    for i in range(dom.n_ext):
        pts[i] = acc
        acc = acc * w % P
    x_ext = dom.to_device(pts)

    bx = FJ.mont_mul(beta_d, x_ext)
    col_idx = 0
    for s in range(nperm):
        cols = cs.permutation_columns[s * chunk : (s + 1) * chunk]
        lhs = dom.rotate_ext(permz_ext[s], 1)
        rhs = permz_ext[s]
        for ci, col in enumerate(cols):
            vals = rot(col.kind, col.index, 0)
            sig = ext_slice("sigma", col_idx)
            lhs = FJ.mont_mul(
                lhs,
                FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(beta_d, sig)), gamma_d),
            )
            dp = cdev(pow(DELTA, col_idx, P))
            rhs = FJ.mont_mul(
                rhs, FJ.add_mod(FJ.add_mod(vals, FJ.mont_mul(dp, bx)), gamma_d)
            )
            col_idx += 1
        terms.append((f"perm:set{s}", FJ.mont_mul(FJ.sub_mod(lhs, rhs), lactive_ext)))

    # lookup terms
    theta_d = cdev(theta)
    for li, lk in enumerate(cs.lookups):
        z = ext_slice("lookup_z", li)
        a_p = ext_slice("lookup_a", li)
        s_p = ext_slice("lookup_s", li)
        comp_in = None
        for expr in lk.input_exprs:
            v = expr.evaluate(dev_ops)
            comp_in = v if comp_in is None else FJ.add_mod(FJ.mont_mul(comp_in, theta_d), v)
        comp_tab = None
        for expr in lk.table_exprs:
            v = expr.evaluate(dev_ops)
            comp_tab = v if comp_tab is None else FJ.add_mod(FJ.mont_mul(comp_tab, theta_d), v)
        terms.append(("lookup:l0z", FJ.mont_mul(l0_ext, FJ.sub_mod(one, z))))
        terms.append(("lookup:llast", FJ.mont_mul(llast_ext, FJ.sub_mod(FJ.mont_mul(z, z), z))))
        lhs = FJ.mont_mul(
            dom.rotate_ext(z, 1),
            FJ.mont_mul(FJ.add_mod(a_p, beta_d), FJ.add_mod(s_p, gamma_d)),
        )
        rhs = FJ.mont_mul(
            z,
            FJ.mont_mul(
                FJ.add_mod(comp_in, beta_d), FJ.add_mod(comp_tab, gamma_d)
            ),
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

    if _diag:
        check_rows = [0, 1, 2, 3, 4, 5, 6, 42, 43, 44, 45, 46, 82]
        for label, term in terms:
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

    y_d = cdev(y)
    numer = None
    for _, term in terms:
        term = jnp.broadcast_to(term, (16, dom.n_ext)).astype(jnp.uint32)
        numer = term if numer is None else FJ.add_mod(FJ.mont_mul(numer, y_d), term)
    h_ext = dom.divide_by_vanishing(numer)
    h_coeff_dev = dom.extended_to_coeff(h_ext)  # (16, n_ext)
    h_coeffs = dom.from_device(h_coeff_dev)

    # strip top zero coefficients into exactly (degree-1) pieces of size n
    num_h = cs.degree() - 1
    assert all(c == 0 for c in h_coeffs[num_h * n :]), "quotient degree overflow"
    h_pieces = [h_coeffs[i * n : (i + 1) * n] for i in range(num_h)]
    for pt in MSM.msm_auto_batch(params.g, h_pieces):
        t.write_point(pt)
    x = t.squeeze_challenge()

    # ---- phase 5: evaluations (batched powers-dot on device) --------------
    x_next = x * omega % P
    x_prev = x * F.fr_inv(omega) % P
    x_last = x * F.fr_pow(F.fr_inv(omega), blinders + 1) % P
    x_n = F.fr_pow(x, n)

    eval_cache: dict = {}
    pw_cache: dict = {}

    def evals_at(point: int) -> list[int]:
        """All batched columns evaluated at `point` (one device dispatch)."""
        if point not in eval_cache:
            pw = PD.powers_dev(point, n)
            pw_cache[point] = pw
            eval_cache[point] = dom.scalars_from_device(
                PD.eval_coeffs_at(big_coeff, pw)
            )
        return eval_cache[point]

    def ev(name, idx, point) -> int:
        return evals_at(point)[offsets[name] + idx]

    random_dev = dom.to_device(random_poly)  # coefficient form

    for col, rot_i in cs.advice_queries:
        point = x * F.fr_pow(omega, rot_i % n) % P
        t.write_scalar(ev("advice", col, point))
    for col, rot_i in cs.fixed_queries:
        point = x * F.fr_pow(omega, rot_i % n) % P
        t.write_scalar(ev("fixed", col, point))
    t.write_scalar(
        dom.scalars_from_device(
            PD.eval_coeffs_at(random_dev, pw_cache.setdefault(x, PD.powers_dev(x, n)))
        )[0]
    )
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

    # ---- phase 6: SHPLONK multiopen (device poly combination) -------------
    # quotient pieces recombined with x^n weights
    h_pieces_dev = h_coeff_dev[:, : num_h * n].reshape(16, num_h, n)
    h_combined_dev = None
    xn_pow = 1
    for i in range(num_h):
        piece = FJ.mont_mul(h_pieces_dev[:, i], cdev(xn_pow))
        h_combined_dev = piece if h_combined_dev is None else FJ.add_mod(h_combined_dev, piece)
        xn_pow = xn_pow * x_n % P

    def poly_coeff_dev(poly):
        kind = poly[0]
        if kind == "quotient":
            return h_combined_dev
        if kind == "random":
            return random_dev
        return coeff_slice(kind, poly[1])

    def poly_eval_at(poly, point) -> int:
        kind = poly[0]
        if kind == "quotient":
            return dom.scalars_from_device(
                PD.eval_coeffs_at(h_combined_dev, pw_cache[point])
            )[0]
        if kind == "random":
            return dom.scalars_from_device(
                PD.eval_coeffs_at(random_dev, pw_cache[point])
            )[0]
        return evals_at(point)[offsets[kind] + poly[1]]

    sets = rotation_sets(cs)
    point_of = {}
    for rots, _ in sets:
        for r in rots:
            point_of.setdefault(r, x * F.fr_pow(omega, r % n) % P)

    set_devs = []  # (rots, f_dev, f_evals at set points)
    for rots, polys in sets:
        f_dev = None
        zeta_pow = 1
        evals = [0] * len(rots)
        for poly in polys:
            pc = FJ.mont_mul(poly_coeff_dev(poly), cdev(zeta_pow))
            f_dev = pc if f_dev is None else FJ.add_mod(f_dev, pc)
            for i, r in enumerate(rots):
                evals[i] = (
                    evals[i] + zeta_pow * poly_eval_at(poly, point_of[r])
                ) % P
            zeta_pow = zeta_pow * zeta % P
        set_devs.append((rots, f_dev, evals))

    h_x_dev = None
    nu_pow = 1
    for rots, f_dev, evals in set_devs:
        pts_j = [point_of[r] for r in rots]
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
        r_dev = jnp.zeros((16, n), jnp.uint32)
        r_dev = r_dev.at[:, : len(r_coeffs)].set(dom.to_device(r_coeffs))
        q = FJ.sub_mod(f_dev, r_dev)
        for pt in pts_j:
            q = PD.divide_linear_dev(q, pt)
        q = FJ.mont_mul(q, cdev(nu_pow))
        h_x_dev = q if h_x_dev is None else FJ.add_mod(h_x_dev, q)
        nu_pow = nu_pow * nu % P

    t.write_point(MSM.msm_auto(params.g, dom.from_device(h_x_dev)))
    mu = t.squeeze_challenge()

    diffs = []
    for rots, _, _ in set_devs:
        d = 1
        for r, pt in point_of.items():
            if r not in rots:
                d = d * ((mu - pt) % P) % P
        diffs.append(d)
    diff0_inv = F.fr_inv(diffs[0])
    z0_mu = 1
    for r in set_devs[0][0]:
        z0_mu = z0_mu * ((mu - point_of[r]) % P) % P

    l_dev = None
    total_rmu = 0
    nu_pow = 1
    for j, (rots, f_dev, evals) in enumerate(set_devs):
        norm = diffs[j] * diff0_inv % P
        pts_j = [point_of[r] for r in rots]
        # r_j(mu) via barycentric through the set points (host, ≤3 points)
        r_mu = 0
        for i, (pt, ev_i) in enumerate(zip(pts_j, evals)):
            li = 1
            for jj, other in enumerate(pts_j):
                if jj != i:
                    li = li * ((mu - other) * F.fr_inv((pt - other) % P) % P) % P
            r_mu = (r_mu + ev_i * li) % P
        coeff = nu_pow * norm % P
        total_rmu = (total_rmu + coeff * r_mu) % P
        fc = FJ.mont_mul(f_dev, cdev(coeff))
        l_dev = fc if l_dev is None else FJ.add_mod(l_dev, fc)
        nu_pow = nu_pow * nu % P
    l_dev = FJ.sub_mod(l_dev, FJ.mont_mul(h_x_dev, cdev(z0_mu)))
    e0 = jnp.zeros((16, n), jnp.uint32)
    e0 = e0.at[:, :1].set(dom.const_dev(total_rmu).reshape(16, 1))
    l_dev = FJ.sub_mod(l_dev, e0)

    w_prime_dev = PD.divide_linear_dev(l_dev, mu)
    t.write_point(MSM.msm_auto(params.g, dom.from_device(w_prime_dev)))

    return t.finalize()

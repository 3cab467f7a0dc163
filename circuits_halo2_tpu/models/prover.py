"""PLONKish prover — KZG commitments + SHPLONK (BDFG21) multiopen.

Replaces halo2's ``create_proof`` with ``ProverSHPLONK`` (reference use:
`zk_prover/src/circuits/utils.rs:93-102`). Protocol phases (§3.1 SURVEY):

1. witness synthesis → blinded advice commitments          → θ
2. permuted lookup columns A', S'                          → β, γ
3. permutation & lookup grand products + random poly       → y
4. quotient h(X) on the extended coset domain (device)     → x
5. evaluations at x·ω^rot                                  → ζ, ν
6. SHPLONK h_x commitment W                                → μ, then W'

Polynomial-heavy steps (NTTs, extended-domain pointwise gate evaluation,
vanishing division) run on the device limb backend (utils/poly_device);
commitments use the Pippenger MSM; the Fiat–Shamir transcript is host-side.

Blinding is drawn from an injectable deterministic RNG so proofs are
reproducible in tests (the reference uses OsRng — any valid blinding
verifies; see SURVEY §7 "bit-exactness" note).
"""

from __future__ import annotations

import hashlib

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as MSM
from ..utils.srs import ParamsKZG
from ..utils.transcript import KeccakTranscript
from ..utils import poly_device
from .assignment import Assignment
from .keygen import DELTA, ProvingKey
from .verifier import multiopen_queries, num_perm_sets, perm_chunk_len, rotation_sets

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


def _poly_eval(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def _divide_linear(coeffs: list[int], point: int) -> list[int]:
    """Exact division by (X - point); remainder must vanish."""
    out = [0] * (len(coeffs) - 1)
    rem = 0
    for i in range(len(coeffs) - 1, -1, -1):
        cur = (coeffs[i] + rem * point) % P
        if i == 0:
            assert cur == 0, "non-zero remainder in linear division"
        else:
            out[i - 1] = cur
            rem = cur
    return out


def _row_eval(expr, row: int, n: int, advice, fixed, instance, cs):
    ops = {
        "constant": lambda v: v % P,
        "fixed": lambda q, c, r: fixed[c][(row + r) % n],
        "advice": lambda q, c, r: advice[c][(row + r) % n],
        "instance": lambda q, c, r: instance[c][(row + r) % n],
        "negated": lambda a: (-a) % P,
        "sum": lambda a, b: (a + b) % P,
        "product": lambda a, b: a * b % P,
        "scaled": lambda a, k: a * k % P,
        "selector": None,
    }
    return expr.evaluate(ops)


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

    # ---- phase 2: permuted lookup columns ---------------------------------
    lookups = []
    for lk in cs.lookups:
        a_comp = [0] * n
        s_comp = [0] * n
        for row in range(n):
            acc = 0
            for expr in lk.input_exprs:
                acc = (
                    acc * theta
                    + _row_eval(expr, row, n, advice, fixed, instance_vals, cs)
                ) % P
            a_comp[row] = acc
            acc = 0
            for expr in lk.table_exprs:
                acc = (
                    acc * theta
                    + _row_eval(expr, row, n, advice, fixed, instance_vals, cs)
                ) % P
            s_comp[row] = acc

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
            {"a": a_comp, "s": s_comp, "a_perm": a_perm, "s_perm": s_perm}
        )
    lk_rows = [c for lk in lookups for c in (lk["a_perm"], lk["s_perm"])]
    if lk_rows:
        for pt in MSM.msm_auto_batch(params.g_lagrange, lk_rows):
            t.write_point(pt)

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()

    # ---- phase 3: grand products + random poly ----------------------------
    def column_values(col):
        if col.kind == "advice":
            return advice[col.index]
        if col.kind == "fixed":
            return fixed[col.index]
        return instance_vals[col.index]

    perm_zs = []
    last_z = 1  # sets chain: z_s(0) = z_{s-1}(omega^usable)
    for s in range(nperm):
        cols = cs.permutation_columns[s * chunk : (s + 1) * chunk]
        sigmas = vk.sigma_values[s * chunk : (s + 1) * chunk]
        numer = [1] * usable
        denom = [1] * usable
        for ci, col in enumerate(cols):
            vals = column_values(col)
            sig = sigmas[ci]
            delta_pow = pow(DELTA, s * chunk + ci, P)
            w = 1
            for row in range(usable):
                # z ratio = Π(v + β·δ^col·ω^row + γ) / Π(v + β·σ + γ)
                numer[row] = (
                    numer[row]
                    * ((vals[row] + beta * delta_pow % P * w + gamma) % P)
                    % P
                )
                denom[row] = denom[row] * ((vals[row] + beta * sig[row] + gamma) % P) % P
                w = w * omega % P
        denom_inv = F.batch_inv(denom)
        z = [last_z] * n
        for row in range(usable):
            z[row + 1] = z[row] * numer[row] % P * denom_inv[row] % P
        last_z = z[usable]
        for row in range(usable + 1, n):
            z[row] = rng.next_field()
        perm_zs.append(z)

    lookup_zs = []
    for lk in lookups:
        numer = [
            (lk["a"][i] + beta) * (lk["s"][i] + gamma) % P for i in range(usable)
        ]
        denom = [
            (lk["a_perm"][i] + beta) * (lk["s_perm"][i] + gamma) % P
            for i in range(usable)
        ]
        denom_inv = F.batch_inv(denom)
        z = [1] * n
        for row in range(usable):
            z[row + 1] = z[row] * numer[row] % P * denom_inv[row] % P
        for row in range(usable + 1, n):
            z[row] = rng.next_field()
        lookup_zs.append(z)

    for pt in MSM.msm_auto_batch(params.g_lagrange, perm_zs + lookup_zs):
        t.write_point(pt)

    random_poly = [rng.next_field() for _ in range(n)]
    t.write_point(MSM.msm_auto(params.g, random_poly))
    y = t.squeeze_challenge()

    # ---- phase 4: quotient on the extended domain (device) ----------------
    import jax.numpy as jnp
    from ..ops import field_jax as FJ

    def to_ext(values):
        dev = dom.to_device(values)
        return dom.coeff_to_extended(dom.lagrange_to_coeff(dev))

    adv_ext = [to_ext(col) for col in advice]
    fix_ext = [to_ext(col) for col in fixed]
    inst_ext = [to_ext(col) for col in instance_vals]
    sig_ext = [to_ext(col) for col in vk.sigma_values]
    permz_ext = [to_ext(z) for z in perm_zs]
    lookupz_ext = [to_ext(z) for z in lookup_zs]
    aperm_ext = [to_ext(lk["a_perm"]) for lk in lookups]
    sperm_ext = [to_ext(lk["s_perm"]) for lk in lookups]

    l0_vals = [0] * n
    l0_vals[0] = 1
    llast_vals = [0] * n
    llast_vals[usable] = 1
    lactive_vals = [1 if r < usable else 0 for r in range(n)]
    l0_ext = to_ext(l0_vals)
    llast_ext = to_ext(llast_vals)
    lactive_ext = to_ext(lactive_vals)

    # coset points tensor (identity polynomial X on the extended domain)
    g = poly_device.COSET_GEN
    pts = [0] * dom.n_ext
    acc = g
    w = dom.omega_ext
    for i in range(dom.n_ext):
        pts[i] = acc
        acc = acc * w % P
    x_ext = dom.to_device(pts)

    one = dom.const_dev(1)

    def cdev(v):
        return dom.const_dev(v % P)

    rot_cache: dict = {}

    def rot(kind, idx, r):
        key = (kind, idx, r)
        if key not in rot_cache:
            base = {
                "advice": adv_ext,
                "fixed": fix_ext,
                "instance": inst_ext,
            }[kind][idx]
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
    delta_pow = beta
    bx = FJ.mont_mul(beta_d, x_ext)
    col_idx = 0
    for s in range(nperm):
        cols = cs.permutation_columns[s * chunk : (s + 1) * chunk]
        lhs = dom.rotate_ext(permz_ext[s], 1)
        rhs = permz_ext[s]
        for ci, col in enumerate(cols):
            vals = rot(col.kind, col.index, 0)
            sig = sig_ext[col_idx]
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
        z = lookupz_ext[li]
        a_p = aperm_ext[li]
        s_p = sperm_ext[li]
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
        from ..ops import ntt as _ntt
        check_rows = [0, 1, 2, 3, 4, 5, 6, 42, 43, 44, 45, 46, 82]
        for label, term in terms:
            tc = dom.from_device(dom.extended_to_coeff(
                jnp.broadcast_to(term, (16, dom.n_ext)).astype(jnp.uint32)))
            rem = [0] * n
            for i, c in enumerate(tc):
                rem[i % n] = (rem[i % n] + c) % P
            evals = _ntt.ntt_host(rem, omega)
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
    h_coeffs = dom.from_device(dom.extended_to_coeff(h_ext))

    # strip top zero coefficients into exactly (degree-1) pieces of size n
    num_h = cs.degree() - 1
    assert all(c == 0 for c in h_coeffs[num_h * n :]), "quotient degree overflow"
    h_pieces = [h_coeffs[i * n : (i + 1) * n] for i in range(num_h)]
    for pt in MSM.msm_auto_batch(params.g, h_pieces):
        t.write_point(pt)
    x = t.squeeze_challenge()

    # ---- phase 5: evaluations ---------------------------------------------
    # coefficient forms (host ints) for evaluation + multiopen
    def coeffs_of(values):
        return dom.from_device(dom.lagrange_to_coeff(dom.to_device(values)))

    advice_coeffs = [coeffs_of(col) for col in advice]
    permz_coeffs = [coeffs_of(z) for z in perm_zs]
    lookupz_coeffs = [coeffs_of(z) for z in lookup_zs]
    aperm_coeffs = [coeffs_of(lk["a_perm"]) for lk in lookups]
    sperm_coeffs = [coeffs_of(lk["s_perm"]) for lk in lookups]
    fixed_coeffs = pk.fixed_polys
    sigma_coeffs = pk.sigma_polys

    x_next = x * omega % P
    x_prev = x * F.fr_inv(omega) % P
    x_last = x * F.fr_pow(F.fr_inv(omega), blinders + 1) % P
    x_n = F.fr_pow(x, n)

    for col, rot_i in cs.advice_queries:
        point = x * F.fr_pow(omega, rot_i % n) % P
        t.write_scalar(_poly_eval(advice_coeffs[col], point))
    for col, rot_i in cs.fixed_queries:
        point = x * F.fr_pow(omega, rot_i % n) % P
        t.write_scalar(_poly_eval(fixed_coeffs[col], point))
    t.write_scalar(_poly_eval(random_poly, x))
    for i in range(len(cs.permutation_columns)):
        t.write_scalar(_poly_eval(sigma_coeffs[i], x))
    for s in range(nperm):
        t.write_scalar(_poly_eval(permz_coeffs[s], x))
        t.write_scalar(_poly_eval(permz_coeffs[s], x_next))
        if s < nperm - 1:
            t.write_scalar(_poly_eval(permz_coeffs[s], x_last))
    for li in range(len(cs.lookups)):
        t.write_scalar(_poly_eval(lookupz_coeffs[li], x))
        t.write_scalar(_poly_eval(lookupz_coeffs[li], x_next))
        t.write_scalar(_poly_eval(aperm_coeffs[li], x))
        t.write_scalar(_poly_eval(aperm_coeffs[li], x_prev))
        t.write_scalar(_poly_eval(sperm_coeffs[li], x))

    zeta = t.squeeze_challenge()
    nu = t.squeeze_challenge()

    # ---- phase 6: SHPLONK multiopen ---------------------------------------
    h_combined = [0] * n
    xn_pow = 1
    for piece in h_pieces:
        for i, c in enumerate(piece):
            h_combined[i] = (h_combined[i] + xn_pow * c) % P
        xn_pow = xn_pow * x_n % P

    def poly_coeffs(poly):
        kind = poly[0]
        return {
            "advice": lambda: advice_coeffs[poly[1]],
            "fixed": lambda: fixed_coeffs[poly[1]],
            "sigma": lambda: sigma_coeffs[poly[1]],
            "perm_z": lambda: permz_coeffs[poly[1]],
            "lookup_z": lambda: lookupz_coeffs[poly[1]],
            "lookup_a": lambda: aperm_coeffs[poly[1]],
            "lookup_s": lambda: sperm_coeffs[poly[1]],
            "quotient": lambda: h_combined,
            "random": lambda: random_poly,
        }[kind]()

    sets = rotation_sets(cs)
    point_of = {}
    for rots, _ in sets:
        for r in rots:
            point_of.setdefault(r, x * F.fr_pow(omega, r % n) % P)

    set_polys = []
    for rots, polys in sets:
        f = [0] * n
        zeta_pow = 1
        for poly in polys:
            pc = poly_coeffs(poly)
            for i, c in enumerate(pc):
                f[i] = (f[i] + zeta_pow * c) % P
            zeta_pow = zeta_pow * zeta % P
        set_polys.append((rots, f))

    h_x = [0] * n
    nu_pow = 1
    for rots, f in set_polys:
        pts_j = [point_of[r] for r in rots]
        evals = [_poly_eval(f, pt) for pt in pts_j]
        # r_j: Lagrange interpolation through (pts_j, evals)
        r_coeffs = [0] * len(pts_j)
        for i, (pt, ev) in enumerate(zip(pts_j, evals)):
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
            scale = ev * F.fr_inv(denom) % P
            for kk, b in enumerate(basis):
                r_coeffs[kk] = (r_coeffs[kk] + scale * b) % P
        q = [(a - b) % P for a, b in zip(f, list(r_coeffs) + [0] * (n - len(r_coeffs)))]
        for pt in pts_j:
            q = _divide_linear(q, pt) + [0]
        for i, c in enumerate(q):
            h_x[i] = (h_x[i] + nu_pow * c) % P
        nu_pow = nu_pow * nu % P

    t.write_point(MSM.msm_auto(params.g, h_x))
    mu = t.squeeze_challenge()

    universe = list(point_of.values())
    diffs = []
    for rots, _ in set_polys:
        d = 1
        for r, pt in point_of.items():
            if r not in rots:
                d = d * ((mu - pt) % P) % P
        diffs.append(d)
    diff0_inv = F.fr_inv(diffs[0])
    z0_mu = 1
    for r in set_polys[0][0]:
        z0_mu = z0_mu * ((mu - point_of[r]) % P) % P

    l_poly = [0] * n
    nu_pow = 1
    for j, (rots, f) in enumerate(set_polys):
        norm = diffs[j] * diff0_inv % P
        pts_j = [point_of[r] for r in rots]
        evals = [_poly_eval(f, pt) for pt in pts_j]
        # r_j(mu)
        r_mu = 0
        for i, (pt, ev) in enumerate(zip(pts_j, evals)):
            li = 1
            for jj, other in enumerate(pts_j):
                if jj != i:
                    li = li * ((mu - other) * F.fr_inv((pt - other) % P) % P) % P
            r_mu = (r_mu + ev * li) % P
        coeff = nu_pow * norm % P
        l_poly[0] = (l_poly[0] - coeff * r_mu) % P
        for i, c in enumerate(f):
            l_poly[i] = (l_poly[i] + coeff * c) % P
        nu_pow = nu_pow * nu % P
    for i, c in enumerate(h_x):
        l_poly[i] = (l_poly[i] - z0_mu * c) % P

    w_prime = _divide_linear(l_poly, mu)
    t.write_point(MSM.msm_auto(params.g, w_prime))

    return t.finalize()

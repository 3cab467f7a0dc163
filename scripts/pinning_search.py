"""Search Rust `Debug`-format variants of PinnedVerificationKey until the
blake2b digest matches the reference vk digest.

The reference digest is hard-coded in the reference-generated verifier
(`contracts/src/InclusionVerifier.sol` vk_digest,
0x10f28bc710a8bdd00dd701df2f5fc4f5ccdb260238eba6f819db692f79dc3dc9).
The uncertain dimensions are PSE-2023 fork details of the Debug rendering:
lookup-argument `name` field, phase fields in the pinned constraint system,
G1 affine point format, and query field naming. Everything else (expression
tree shapes, query order, commitments) is already validated bit-exactly via
the generated-verifier parity tests.

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/pinning_search.py
"""

import hashlib
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from circuits_halo2_tpu.models import expr as E  # noqa: E402
from circuits_halo2_tpu.models.cs import Column  # noqa: E402
from circuits_halo2_tpu.ops.field import FQ_MOD, FR_MOD  # noqa: E402
from circuits_halo2_tpu.utils import pipeline  # noqa: E402

TARGET = 0x10F28BC710A8BDD00DD701DF2F5FC4F5CCDB260238EBA6F819DB692F79DC3DC9

_KIND = {"advice": "Advice", "fixed": "Fixed", "instance": "Instance"}


def render(vk, opts) -> str:
    cs = vk.cs
    k = vk.k
    deg = cs.degree()
    quot = deg - 1
    n = 1 << k
    extended_k = k
    while (1 << extended_k) < n * quot:
        extended_k += 1
    extended_k += opts.get("ek_delta", 0)

    def _hex(v):
        return "0x" + format(v % FR_MOD, "064x")

    def _point(p):
        if p is None:
            return "Infinity"
        if opts["point"] == "tuple":
            return "(0x" + format(p[0], "064x") + ", 0x" + format(p[1], "064x") + ")"
        return (
            "G1Affine { x: 0x" + format(p[0], "064x")
            + ", y: 0x" + format(p[1], "064x") + " }"
        )

    def _column(c):
        ct = _KIND[c.kind]
        if c.kind == "advice" and opts["phase_in_column"]:
            ct = "Advice { phase: Phase(0) }"
        return f"Column {{ index: {c.index}, column_type: {ct} }}"

    def _rot(r):
        return f"Rotation({r})"

    qr = opts["query_render"]

    def _qfield(idx):
        if qr == "query_index_plain":
            return f"query_index: {idx}, "
        if qr == "query_index_some":
            return f"query_index: Some({idx}), "
        if qr == "index_plain":
            return f"index: {idx}, "
        if qr == "index_some":
            return f"index: Some({idx}), "
        return ""  # omit

    def _expr(e):
        if isinstance(e, E.Const):
            return f"Constant({_hex(e.value)})"
        if isinstance(e, E.FixedQuery):
            return (
                f"Fixed {{ {_qfield(e.query_index)}column_index: "
                f"{e.column}, rotation: {_rot(e.rotation)} }}"
            )
        if isinstance(e, E.AdviceQuery):
            extra = ", phase: Phase(0)" if opts["phase_in_query"] else ""
            return (
                f"Advice {{ {_qfield(e.query_index)}column_index: "
                f"{e.column}, rotation: {_rot(e.rotation)}{extra} }}"
            )
        if isinstance(e, E.InstanceQuery):
            return (
                f"Instance {{ {_qfield(e.query_index)}column_index: "
                f"{e.column}, rotation: {_rot(e.rotation)} }}"
            )
        if isinstance(e, E.Neg):
            return f"Negated({_expr(e.inner)})"
        if isinstance(e, E.Sum):
            return f"Sum({_expr(e.left)}, {_expr(e.right)})"
        if isinstance(e, E.Product):
            return f"Product({_expr(e.left)}, {_expr(e.right)})"
        if isinstance(e, E.Scaled):
            return f"Scaled({_expr(e.inner)}, {_hex(e.scalar)})"
        raise TypeError(e)

    gates = ", ".join(_expr(p) for g in cs.gates for p in g.polys)
    adv_q = ", ".join(
        f"({_column(Column('advice', c))}, {_rot(r)})" for c, r in cs.advice_queries
    )
    inst_q = ", ".join(
        f"({_column(Column('instance', c))}, {_rot(r)})"
        for c, r in cs.instance_queries
    )
    fix_q = ", ".join(
        f"({_column(Column('fixed', c))}, {_rot(r)})" for c, r in cs.fixed_queries
    )
    perm_cols = ", ".join(_column(c) for c in cs.permutation_columns)

    def _lookup(lk):
        name = f'name: "{lk.name}", ' if opts["lookup_name"] else ""
        return (
            "Argument { " + name + "input_expressions: ["
            + ", ".join(_expr(e) for e in lk.input_exprs)
            + "], table_expressions: ["
            + ", ".join(_expr(e) for e in lk.table_exprs)
            + "] }"
        )

    lookups = ", ".join(_lookup(lk) for lk in cs.lookups)
    constants = ", ".join(_column(c) for c in cs.constants)
    fixed_comms = ", ".join(_point(p) for p in vk.fixed_commitments)
    perm_comms = ", ".join(_point(p) for p in vk.permutation_commitments)

    phases = ""
    if opts["phases_block"]:
        acp = ", ".join("Phase(0)" for _ in range(cs.num_advice))
        phases = (
            "num_challenges: 0, "
            f"advice_column_phase: [{acp}], "
            "challenge_phase: [], "
        )

    return (
        "PinnedVerificationKey { "
        f'base_modulus: "0x{FQ_MOD:064x}", '
        f'scalar_modulus: "0x{FR_MOD:064x}", '
        "domain: PinnedEvaluationDomain { "
        f"k: {k}, extended_k: {extended_k}, omega: {_hex(vk.omega)} }}, "
        "cs: PinnedConstraintSystem { "
        f"num_fixed_columns: {cs.num_fixed}, "
        f"num_advice_columns: {cs.num_advice}, "
        f"num_instance_columns: {cs.num_instance}, "
        f"num_selectors: {cs.num_selectors}, "
        + phases +
        f"gates: [{gates}], "
        f"advice_queries: [{adv_q}], "
        f"instance_queries: [{inst_q}], "
        f"fixed_queries: [{fix_q}], "
        f"permutation: Argument {{ columns: [{perm_cols}] }}, "
        f"lookups: [{lookups}], "
        f"constants: [{constants}], "
        "minimum_degree: None }, "
        f"fixed_commitments: [{fixed_comms}], "
        f"permutation: VerifyingKey {{ commitments: [{perm_comms}] }} }}"
    )


def digest(s: str, lenpfx="u64le") -> int:
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    if lenpfx == "u64le":
        h.update(len(s).to_bytes(8, "little"))
    elif lenpfx == "u32le":
        h.update(len(s).to_bytes(4, "little"))
    elif lenpfx == "u64be":
        h.update(len(s).to_bytes(8, "big"))
    h.update(s.encode())
    return int.from_bytes(h.digest(), "little") % FR_MOD


def main():
    art = pipeline.generate_setup_artifacts(
        11, str(Path(__file__).parent.parent / "tests" / "fixtures_ptau_hermez-raw-11"),
        4, 2, 8,
    )
    vk = art.vk
    dims = {
        "lookup_name": [False, True],
        "phases_block": [False, True],
        "point": ["tuple", "struct"],
        "query_render": [
            "query_index_plain", "query_index_some",
            "index_plain", "index_some", "omit",
        ],
        "phase_in_column": [False, True],
        "phase_in_query": [False, True],
    }
    keys = list(dims)
    tried = 0
    cs = vk.cs
    orig_selectors = cs.num_selectors
    orig_constants = list(cs.constants)
    orig_instq = list(cs.instance_queries)
    value_dims = {
        "lenpfx": ["u64le", "u32le", "none", "u64be"],
        "ek_delta": [0, -1, 1],
        "nsel": [orig_selectors, 6, 3, 0],
        "consts": [orig_constants, orig_constants[::-1],
                   orig_constants[:1], orig_constants[1:]],
        "instq": [orig_instq, []],
    }
    vkeys = list(value_dims)
    for vcombo in itertools.product(*(value_dims[k] for k in vkeys)):
        vopts = dict(zip(vkeys, vcombo))
        cs.num_selectors = vopts["nsel"]
        cs.constants = vopts["consts"]
        cs.instance_queries = vopts["instq"]
        for combo in itertools.product(*(dims[k] for k in keys)):
            opts = dict(zip(keys, combo))
            opts["ek_delta"] = vopts["ek_delta"]
            s = render(vk, opts)
            d = digest(s, vopts["lenpfx"])
            tried += 1
            if d == TARGET:
                print("MATCH:", opts, vopts)
                Path("/tmp/pinned_match.txt").write_text(s)
                return
    cs.num_selectors = orig_selectors
    cs.constants = orig_constants
    cs.instance_queries = orig_instq
    print(f"no match in {tried} combos")


if __name__ == "__main__":
    main()

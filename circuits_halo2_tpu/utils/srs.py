"""KZG structured reference string (SRS) — the halo2 ``ParamsKZG`` equivalent.

Raw file format parity (`backend/ptau/hermez-raw-11`, layout documented in
SURVEY.md §2a #39 and `backend/README.md:30-38`):

    u32 k (LE)
    2^k  G1 points, monomial basis  [s^i]G      (64-byte raw affine, LE)
    2^k  G1 points, Lagrange basis  [L_i(s)]G   (64-byte raw affine, LE)
    G2 generator                                 (128-byte raw affine)
    [s]G2                                        (128-byte raw affine)

``setup(k, seed)`` is the unsafe testing setup (reference:
``ParamsKZG::setup(k, OsRng)`` via `zk_prover/src/circuits/utils.rs:66-70`);
it derives Lagrange commitments analytically from the known toxic waste:
L_i(s) = (s^n - 1) / (n · (s - w^i)).
"""

from __future__ import annotations

import hashlib

from ..ops import curve as C
from ..ops import field as F


def _fixed_base_muls(base, scalars):
    """[s·base for s in scalars] — native C++ windowed table when available."""
    from ..native import available as _native_ok, g1_fixed_base_muls

    if _native_ok():
        return g1_fixed_base_muls(base, [s % F.FR_MOD for s in scalars])
    return [C.g1_mul(base, s) for s in scalars]


class ParamsKZG:
    def __init__(self, k: int, g, g_lagrange, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self.g = g                    # monomial basis commitments [s^i]G1
        self.g_lagrange = g_lagrange  # Lagrange basis commitments
        self.g2 = g2
        self.s_g2 = s_g2

    # -- I/O ----------------------------------------------------------------

    @classmethod
    def read(cls, path: str) -> "ParamsKZG":
        with open(path, "rb") as f:
            data = f.read()
        k = int.from_bytes(data[:4], "little")
        n = 1 << k
        ofs = 4
        g = [C.g1_from_raw_bytes(data[ofs + 64 * i : ofs + 64 * (i + 1)]) for i in range(n)]
        ofs += 64 * n
        g_lagrange = [
            C.g1_from_raw_bytes(data[ofs + 64 * i : ofs + 64 * (i + 1)]) for i in range(n)
        ]
        ofs += 64 * n
        g2 = C.g2_from_raw_bytes(data[ofs : ofs + 128])
        s_g2 = C.g2_from_raw_bytes(data[ofs + 128 : ofs + 256])
        return cls(k, g, g_lagrange, g2, s_g2)

    def write(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.k.to_bytes(4, "little"))
            for p in self.g:
                f.write(C.g1_to_raw_bytes(p))
            for p in self.g_lagrange:
                f.write(C.g1_to_raw_bytes(p))
            f.write(C.g2_to_raw_bytes(self.g2))
            f.write(C.g2_to_raw_bytes(self.s_g2))

    # -- generation ---------------------------------------------------------

    @classmethod
    def setup(cls, k: int, seed: bytes = b"circuits-halo2-tpu-test-srs") -> "ParamsKZG":
        """UNSAFE deterministic test setup (do not use in production)."""
        n = 1 << k
        s = (
            int.from_bytes(hashlib.sha256(seed + k.to_bytes(4, "little")).digest(), "little")
            % F.FR_MOD
        )
        gen = C.G1_GEN
        powers = []
        acc = 1
        for _ in range(n):
            powers.append(acc)
            acc = acc * s % F.FR_MOD
        g = _fixed_base_muls(gen, powers)
        # L_i(s) = w^i (s^n - 1) / (n (s - w^i))
        omega = F.fr_pow(F.FR_ROOT_OF_UNITY, 1 << (F.FR_TWO_ADICITY - k))
        sn_minus_1 = (F.fr_pow(s, n) - 1) % F.FR_MOD
        n_inv = F.fr_inv(n)
        denoms = []
        omega_pows = []
        w_i = 1
        for _ in range(n):
            denoms.append((s - w_i) % F.FR_MOD)
            omega_pows.append(w_i)
            w_i = w_i * omega % F.FR_MOD
        denom_invs = F.batch_inv(denoms)
        g_lagrange = _fixed_base_muls(
            gen,
            [
                sn_minus_1 * n_inv % F.FR_MOD * w % F.FR_MOD * di % F.FR_MOD
                for w, di in zip(omega_pows, denom_invs)
            ],
        )
        g2 = C.G2_GEN
        s_g2 = C.g2_mul(g2, s)
        return cls(k, g, g_lagrange, g2, s_g2)

    # -- transforms ---------------------------------------------------------

    def downsize(self, k: int) -> "ParamsKZG":
        """Truncate to a smaller domain (reference `circuits/utils.rs:49-73`).

        Monomial commitments truncate directly; Lagrange commitments for the
        smaller domain are the EC-IFFT of the truncated monomial vector —
        computed by the device MSM path when needed.
        """
        if k == self.k:
            return self
        if k > self.k:
            raise ValueError("cannot upsize params")
        n = 1 << k
        from . import ec_fft

        g = self.g[:n]
        g_lagrange = ec_fft.g_to_lagrange(g, k)
        return ParamsKZG(k, g, g_lagrange, self.g2, self.s_g2)

    # -- commitment ---------------------------------------------------------

    def commit_lagrange(self, evals: list[int]):
        """Commit to a polynomial given by evaluations on the 2^k domain."""
        from ..ops import msm

        assert len(evals) == self.n
        return msm.msm_auto(self.g_lagrange, evals)

    def commit(self, coeffs: list[int]):
        """Commit to a polynomial in coefficient form (degree < 2^k)."""
        from ..ops import msm

        assert len(coeffs) <= self.n
        return msm.msm_auto(self.g[: len(coeffs)], coeffs)

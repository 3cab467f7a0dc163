"""Device-resident polynomial backend for the prover.

All heavy polynomial work — Lagrange↔coefficient transforms, extended-coset
evaluation, pointwise gate/argument evaluation, vanishing division — runs on
(16, N) uint32 Montgomery limb tensors through the jitted NTT/field kernels.
This replaces halo2's rayon-parallel ``EvaluationDomain`` routines
(SURVEY.md §2b FFT/NTT row) with the TPU-native path; the host only touches
scalars (transcript, commitments' scalar extraction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import field_jax as FJ
from ..ops import ntt as NTT

P = F.FR_MOD
R_INV = pow(1 << 256, -1, P)

# Coset generator for the extended domain (any non-subgroup element works;
# the quotient polynomial is domain-independent).
COSET_GEN = 7


def intt_cols(cols: list[list[int]], omega: int) -> list[list[int]]:
    """Batched inverse NTT of host-int columns through the device kernel
    (one dispatch for all columns; used by keygen's Lagrange→coeff step)."""
    if not cols:
        return []
    n = len(cols[0])
    flat = [(v << 256) % P for col in cols for v in col]
    a = jnp.asarray(FJ.ints_to_limbs(flat).reshape(16, len(cols), n))
    out = np.asarray(NTT.intt(a, omega)).reshape(16, -1)
    vals = [v * R_INV % P for v in FJ.limbs_to_ints(out)]
    return [vals[i * n : (i + 1) * n] for i in range(len(cols))]


class Domain:
    """Evaluation domain: size n = 2^k, extended size 2^(k+ext_bits)."""

    def __init__(self, k: int, degree: int):
        self.k = k
        self.n = 1 << k
        ext_bits = max(1, (degree - 1).bit_length())
        self.k_ext = k + ext_bits
        self.n_ext = 1 << self.k_ext
        self.omega = NTT.omega_for_k(k)
        self.omega_ext = NTT.omega_for_k(self.k_ext)
        self.rot_scale = self.n_ext // self.n

        # coset scaling vectors (Montgomery ints → limbs)
        g = COSET_GEN
        g_pows = [1] * self.n_ext
        for i in range(1, self.n_ext):
            g_pows[i] = g_pows[i - 1] * g % P
        g_inv = F.fr_inv(g)
        gi_pows = [1] * self.n_ext
        for i in range(1, self.n_ext):
            gi_pows[i] = gi_pows[i - 1] * g_inv % P
        self._coset = jnp.asarray(
            FJ.ints_to_limbs([(v << 256) % P for v in g_pows])
        )
        self._coset_inv = jnp.asarray(
            FJ.ints_to_limbs([(v << 256) % P for v in gi_pows])
        )
        # 1 / (Zh(coset point)) = 1 / (g^n · w_ext^{n i} - 1), period-8 cycle
        gn = F.fr_pow(g, self.n)
        w_n = F.fr_pow(self.omega_ext, self.n)
        zh = [(gn * F.fr_pow(w_n, i) - 1) % P for i in range(self.n_ext)]
        zh_inv = F.batch_inv(zh)
        self._zh_inv = jnp.asarray(
            FJ.ints_to_limbs([(v << 256) % P for v in zh_inv])
        )

    # -- conversions --------------------------------------------------------

    def to_device(self, values: list[int]) -> jax.Array:
        """Host ints → (16, len) Montgomery limbs."""
        return jnp.asarray(FJ.ints_to_limbs([(v % P << 256) % P for v in values]))

    def from_device(self, limbs) -> list[int]:
        return [v * R_INV % P for v in FJ.limbs_to_ints(np.asarray(limbs))]

    # -- transforms ---------------------------------------------------------

    def lagrange_to_coeff(self, dev_values: jax.Array) -> jax.Array:
        return NTT.intt(dev_values, self.omega)

    def coeff_to_lagrange(self, dev_coeffs: jax.Array) -> jax.Array:
        return NTT.ntt(dev_coeffs, self.omega)

    def coeff_to_extended(self, dev_coeffs: jax.Array) -> jax.Array:
        """Evaluate coeffs on the coset-shifted extended domain."""
        padded = jnp.zeros((16, self.n_ext), jnp.uint32)
        padded = padded.at[:, : dev_coeffs.shape[1]].set(dev_coeffs)
        scaled = FJ.mont_mul(padded, self._coset[:, : self.n_ext])
        return NTT.ntt(scaled, self.omega_ext)

    def extended_to_coeff(self, dev_evals: jax.Array) -> jax.Array:
        coeffs = NTT.intt(dev_evals, self.omega_ext)
        return FJ.mont_mul(coeffs, self._coset_inv)

    def divide_by_vanishing(self, dev_evals: jax.Array) -> jax.Array:
        return FJ.mont_mul(dev_evals, self._zh_inv)

    def rotate_ext(self, dev_evals: jax.Array, rotation: int) -> jax.Array:
        """Rotation by ω^rot on the extended evaluation grid."""
        return jnp.roll(dev_evals, -rotation * self.rot_scale, axis=1)

    # -- constants ----------------------------------------------------------

    @functools.lru_cache(maxsize=None)
    def const_dev(self, value: int) -> jax.Array:
        return jnp.asarray(FJ.FR.const(value))

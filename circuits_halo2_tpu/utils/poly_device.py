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
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax._src import core as _core  # trace_state_clean

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


# ---------------------------------------------------------------------------
# Log-depth device primitives (prefix/suffix scans, batched inversion,
# polynomial evaluation, linear division). These carry the prover's
# host-side per-row loops onto the device so proof generation scales to
# k=17+ (SURVEY.md §7 hot loops; BASELINE.md north-star config).
# ---------------------------------------------------------------------------


def _one_like(a: jax.Array) -> jax.Array:
    one = jnp.asarray(FJ.FR.const(1))
    return jnp.broadcast_to(one.reshape((16,) + (1,) * (a.ndim - 1)), a.shape).astype(a.dtype)


def _shift_scan_flat(a: jax.Array, op, identity: jax.Array, reverse: bool
                     ) -> jax.Array:
    """Hillis–Steele inclusive scan along the last axis with a Montgomery
    binary op. lax.scan over the log2(n) shift distances keeps ONE op in
    the compiled graph regardless of n."""
    n = a.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    shifts = jnp.asarray(
        [1 << i for i in range(max(1, (n - 1).bit_length()))], dtype=jnp.int32
    )
    direction = -1 if reverse else 1

    def body(carry, d):
        prev = jnp.roll(carry, direction * d, axis=-1)
        valid = (idx >= d) if not reverse else (idx < n - d)
        prev = jnp.where(valid, prev, identity)
        return op(carry, prev), None

    out, _ = jax.lax.scan(body, a, shifts)
    return out


def _shift_scan(a: jax.Array, op, identity: jax.Array, reverse: bool) -> jax.Array:
    """Inclusive scan along the last axis, two-level on large n.

    A dynamic-shift ``jnp.roll`` on the minor (lane) axis lowers to
    per-lane rotations — the dominant cost of the flat Hillis–Steele form
    on TPU (same finding as ops/msm._roll_scan). For n ≥ 4096 the scan is
    restructured: the vector is laid out column-major as (n1 blocks ×
    n2 lanes) so consecutive elements run down a MAJOR axis; the
    intra-block scan rolls that major axis (contiguous block moves, full
    128-lane minor), and the n2 block totals get a tiny flat scan before
    broadcasting back. Small n keeps the flat form (the transposes don't
    amortize)."""
    n = a.shape[-1]
    min_n = int(os.environ.get("CIRCUITS_SCAN2_MIN", 4096))
    if n < min_n or n & (n - 1):
        return _shift_scan_flat(a, op, identity, reverse)
    n2 = 128
    n1 = n // n2
    batch = a.shape[:-1]
    # column-major layout: block j = elements [j*n1, (j+1)*n1)
    at = jnp.swapaxes(a.reshape(batch + (n2, n1)), -1, -2)  # (..., n1, n2)
    idx = jnp.arange(n1, dtype=jnp.int32)
    shifts = jnp.asarray(
        [1 << i for i in range(max(1, (n1 - 1).bit_length()))], dtype=jnp.int32
    )
    direction = -1 if reverse else 1
    ident_col = identity[..., :1]

    def body(carry, d):
        prev = jnp.roll(carry, direction * d, axis=-2)
        valid = (idx >= d) if not reverse else (idx < n1 - d)
        prev = jnp.where(valid[:, None], prev, ident_col[..., None, :])
        return op(carry, prev), None

    intra, _ = jax.lax.scan(body, at, shifts)  # (..., n1, n2) inclusive

    # cross-block combine: exclusive scan of the block totals (n2 lanes)
    totals = intra[..., 0, :] if reverse else intra[..., -1, :]  # (..., n2)
    tot_scan = _shift_scan_flat(totals, op, identity[..., :1], reverse)
    if reverse:
        carry_in = jnp.concatenate(
            [tot_scan[..., 1:], jnp.broadcast_to(ident_col, tot_scan[..., :1].shape)],
            axis=-1,
        )
    else:
        carry_in = jnp.concatenate(
            [jnp.broadcast_to(ident_col, tot_scan[..., :1].shape), tot_scan[..., :-1]],
            axis=-1,
        )
    out = op(intra, carry_in[..., None, :])
    return jnp.swapaxes(out, -1, -2).reshape(batch + (n,))


@functools.partial(jax.jit, static_argnames=("n",))
def _cumprod_dev(a: jax.Array, n: int) -> jax.Array:
    return _shift_scan(a, FJ.mont_mul, _one_like(a), reverse=False)


def mont_cumprod(a: jax.Array) -> jax.Array:
    """Inclusive prefix products along the last axis (Montgomery form)."""
    return _cumprod_dev(a, int(a.shape[-1]))


@functools.partial(jax.jit, static_argnames=("n",))
def _batch_inv_dev(a: jax.Array, n: int) -> jax.Array:
    one = _one_like(a)
    pre = _shift_scan(a, FJ.mont_mul, one, reverse=False)
    suf = _shift_scan(a, FJ.mont_mul, one, reverse=True)
    total = pre[..., -1:]
    tinv = FJ.inv_mont(total)
    left = jnp.concatenate([one[..., :1], pre[..., :-1]], axis=-1)
    right = jnp.concatenate([suf[..., 1:], one[..., :1]], axis=-1)
    return FJ.mont_mul(FJ.mont_mul(left, right), tinv)


def batch_inv_dev(a: jax.Array) -> jax.Array:
    """Batched modular inversion along the last axis (one real inversion).

    All inputs must be nonzero (prover-side values are challenge sums,
    nonzero with overwhelming probability — same contract as halo2's
    batch_invert)."""
    return _batch_inv_dev(a, int(a.shape[-1]))


@functools.partial(jax.jit, static_argnames=("n",))
def _powers_dev(x: jax.Array, n: int) -> jax.Array:
    """(16,1) Montgomery x → (16, n) powers [1, x, x^2, ...]."""
    a = jnp.broadcast_to(x, (16, n)).astype(jnp.uint32)
    one = _one_like(a)
    a = jnp.where(jnp.arange(n) == 0, one, a)
    return _shift_scan(a, FJ.mont_mul, one, reverse=False)


def powers_dev(x: int, n: int) -> jax.Array:
    """Powers vector of a host scalar on device (Montgomery limbs)."""
    xm = jnp.asarray(FJ.FR.const(x % P)).reshape(16, 1)
    return _powers_dev(xm, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _tree_sum_dev(a: jax.Array, n: int) -> jax.Array:
    logn = (n - 1).bit_length()
    for _ in range(logn):
        half = a.shape[-1] // 2
        a = FJ.add_mod(a[..., :half], a[..., half:])
    return a


def tree_sum_mod(a: jax.Array) -> jax.Array:
    """Log-depth sum along the (power-of-two) last axis → size-1 axis."""
    return _tree_sum_dev(a, int(a.shape[-1]))


def eval_coeffs_at(coeffs: jax.Array, pw: jax.Array) -> jax.Array:
    """Evaluate coefficient-form polys at the point whose powers vector is
    ``pw`` ((16, n), from powers_dev). coeffs: (16, *batch, n). Returns
    (16, *batch, 1) Montgomery evaluations."""
    t = FJ.mont_mul(coeffs, pw.reshape((16,) + (1,) * (coeffs.ndim - 2) + (-1,)))
    return tree_sum_mod(t)


@functools.partial(jax.jit, static_argnames=("n",))
def _divide_linear_dev(coeffs: jax.Array, pw: jax.Array, ipw: jax.Array, n: int) -> jax.Array:
    """q = coeffs / (X - z), exact division, via the suffix-sum identity
    q_i = z^{-(i+1)} * sum_{j>i} c_j z^j. pw/ipw: (16, n) powers of z and
    z^{-1} (ipw[i] = z^{-i}). Output has n lanes; lane n-1 is zero."""
    t = FJ.mont_mul(coeffs, pw)
    one = _one_like(t)
    zero = jnp.zeros_like(t)
    suf = _shift_scan(t, FJ.add_mod, zero, reverse=True)
    # exclusive suffix: s_i = sum_{j>i}
    s = jnp.concatenate([suf[..., 1:], zero[..., :1]], axis=-1)
    # multiply by z^{-(i+1)} = ipw[i] * z^{-1}
    zinv1 = ipw[:, 1:2]
    del one
    return FJ.mont_mul(FJ.mont_mul(s, ipw), zinv1)


def divide_linear_dev(coeffs: jax.Array, z: int) -> jax.Array:
    """Exact division of a (16, n) coefficient tensor by (X - z)."""
    n = int(coeffs.shape[-1])
    pw = powers_dev(z, n)
    ipw = powers_dev(pow(z % P, -1, P), n)
    return _divide_linear_dev(coeffs, pw, ipw, n)


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

    def cols_to_device(self, cols: list[list[int]]) -> jax.Array:
        """List of B same-length host columns → (16, B, n) Montgomery."""
        flat = [(v % P << 256) % P for col in cols for v in col]
        return jnp.asarray(
            FJ.ints_to_limbs(flat).reshape(16, len(cols), len(cols[0]))
        )

    def from_device(self, limbs) -> list[int]:
        return [v * R_INV % P for v in FJ.limbs_to_ints(np.asarray(limbs))]

    def scalars_from_device(self, limbs) -> list[int]:
        """(16, B, 1) or (16, B) Montgomery evals → B canonical ints."""
        arr = np.asarray(limbs).reshape(16, -1)
        return [v * R_INV % P for v in FJ.limbs_to_ints(arr)]

    # -- point evaluation ---------------------------------------------------

    _omega_pows_cache: jax.Array | None = None

    @property
    def omega_pows(self) -> jax.Array:
        """(16, n) powers of ω (Montgomery). Trace-safe caching: a value
        computed while tracing (DynamicJaxprTracer) is returned uncached —
        caching it would leak the tracer into later traces."""
        if self._omega_pows_cache is None:
            val = powers_dev(self.omega, self.n)
            if not _core.trace_state_clean():
                return val
            self._omega_pows_cache = val
        return self._omega_pows_cache

    def lagrange_eval_weights(self, point: int) -> jax.Array:
        """Barycentric weights w_i = (x^n-1)/n · ω^i/(x-ω^i) as (16, n).

        p(x) = Σ_i v_i·w_i lets every Lagrange-form column be evaluated at
        ``point`` with one mul + log-depth reduction — no coefficient
        conversion (halo2 uses coeff-form Horner; this is the TPU shape)."""
        xm = jnp.asarray(FJ.FR.const(point % P)).reshape(16, 1)
        denom = FJ.sub_mod(jnp.broadcast_to(xm, (16, self.n)).astype(jnp.uint32),
                           self.omega_pows)
        dinv = batch_inv_dev(denom)
        scale = (pow(point, self.n, P) - 1) * F.fr_inv(self.n) % P
        w = FJ.mont_mul(self.omega_pows, dinv)
        return FJ.mont_mul(w, jnp.asarray(FJ.FR.const(scale)).reshape(16, 1))

    def eval_lagrange(self, values: jax.Array, weights: jax.Array) -> jax.Array:
        """values: (16, *batch, n) Lagrange form; weights from
        lagrange_eval_weights. → (16, *batch, 1) Montgomery evals."""
        w = weights.reshape((16,) + (1,) * (values.ndim - 2) + (-1,))
        return tree_sum_mod(FJ.mont_mul(values, w))

    # -- transforms ---------------------------------------------------------

    def lagrange_to_coeff(self, dev_values: jax.Array) -> jax.Array:
        return NTT.intt(dev_values, self.omega)

    def coeff_to_lagrange(self, dev_coeffs: jax.Array) -> jax.Array:
        return NTT.ntt(dev_coeffs, self.omega)

    def coeff_to_extended(self, dev_coeffs: jax.Array) -> jax.Array:
        """Evaluate coeffs on the coset-shifted extended domain.
        Accepts (16, *batch, n); returns (16, *batch, n_ext)."""
        pad_shape = dev_coeffs.shape[:-1] + (self.n_ext - dev_coeffs.shape[-1],)
        padded = jnp.concatenate(
            [dev_coeffs, jnp.zeros(pad_shape, jnp.uint32)], axis=-1
        )
        coset = self._coset.reshape((16,) + (1,) * (padded.ndim - 2) + (-1,))
        scaled = FJ.mont_mul(padded, coset)
        return NTT.ntt(scaled, self.omega_ext)

    def extended_to_coeff(self, dev_evals: jax.Array) -> jax.Array:
        coeffs = NTT.intt(dev_evals, self.omega_ext)
        ci = self._coset_inv.reshape((16,) + (1,) * (coeffs.ndim - 2) + (-1,))
        return FJ.mont_mul(coeffs, ci)

    def divide_by_vanishing(self, dev_evals: jax.Array) -> jax.Array:
        zi = self._zh_inv.reshape((16,) + (1,) * (dev_evals.ndim - 2) + (-1,))
        return FJ.mont_mul(dev_evals, zi)

    def rotate_ext(self, dev_evals: jax.Array, rotation: int) -> jax.Array:
        """Rotation by ω^rot on the extended evaluation grid."""
        return jnp.roll(dev_evals, -rotation * self.rot_scale, axis=-1)

    def rotate_base(self, dev_values: jax.Array, rotation: int) -> jax.Array:
        """Rotation by ω^rot on the base evaluation grid (row i → i+rot)."""
        return jnp.roll(dev_values, -rotation, axis=-1)

    # -- constants ----------------------------------------------------------

    @functools.lru_cache(maxsize=None)
    def const_dev(self, value: int) -> np.ndarray:
        """(16, 1) Montgomery constant as a host numpy array — numpy (not
        jnp) so the cached value is safe to reuse across jit traces (a
        cached DynamicJaxprTracer would leak between traces)."""
        return FJ.FR.const(value)

    _x_ext_cache: jax.Array | None = None

    @property
    def x_ext(self) -> jax.Array:
        """Identity polynomial X on the coset extended grid: (16, n_ext)
        Montgomery tensor with lane i = g·ω_ext^i. Trace-safe caching (see
        omega_pows)."""
        if self._x_ext_cache is None:
            pw = powers_dev(self.omega_ext, self.n_ext)
            g = jnp.asarray(FJ.FR.const(COSET_GEN))
            val = FJ.mont_mul(pw, g)
            if not _core.trace_state_clean():
                return val
            self._x_ext_cache = val
        return self._x_ext_cache


@functools.lru_cache(maxsize=None)
def domain(k: int, degree: int) -> Domain:
    """Process-wide Domain cache: the coset/vanishing constant tables and
    every jitted-callable captured device constant are built once per
    (k, degree) shape, so repeated proofs skip the setup entirely."""
    return Domain(k, degree)

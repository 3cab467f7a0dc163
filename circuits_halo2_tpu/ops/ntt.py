"""Number-theoretic transform (radix-2 FFT over Fr) — host + device paths.

Replaces ``halo2_proofs::arithmetic::best_fft`` (SURVEY.md §2b). Semantics:
``ntt(a, omega)`` computes the DFT  out[i] = Σ_j a[j]·omega^{i·j}  for a
domain of size n = len(a) = 2^k where omega^n = 1. The inverse transform is
``ntt(a, omega^-1)`` scaled by n^{-1} (matching halo2's split convention).

Device path: limbs-leading (16, n) Montgomery tensors; each of the log2(n)
stages is one vectorized butterfly over the whole array (reshape, no
gathers), with per-stage twiddle tables precomputed host-side in Montgomery
form. Cross-chip sharding for large n lives in ``parallel/``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_jax as FJ


# ---------------------------------------------------------------------------
# Host path
# ---------------------------------------------------------------------------

def bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def ntt_host(a: list[int], omega: int) -> list[int]:
    """Iterative radix-2 DIT NTT on Python ints (reference path)."""
    n = len(a)
    assert n & (n - 1) == 0
    p = F.FR_MOD
    rev = bit_reverse_indices(n)
    out = [a[rev[i]] for i in range(n)]
    logn = n.bit_length() - 1
    for s in range(logn):
        half = 1 << s
        step = F.fr_pow(omega, n >> (s + 1))
        for start in range(0, n, 2 * half):
            w = 1
            for j in range(half):
                u = out[start + j]
                v = out[start + half + j] * w % p
                out[start + j] = (u + v) % p
                out[start + half + j] = (u - v) % p
                w = w * step % p
    return out


def intt_host(a: list[int], omega: int) -> list[int]:
    n = len(a)
    n_inv = F.fr_inv(n)
    res = ntt_host(a, F.fr_inv(omega))
    return [x * n_inv % F.FR_MOD for x in res]


def omega_for_k(k: int) -> int:
    """Primitive 2^k-th root of unity in Fr (halo2 domain omega)."""
    return F.fr_pow(F.FR_ROOT_OF_UNITY, 1 << (F.FR_TWO_ADICITY - k))


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------

_twiddle_cache: dict[tuple[int, int], list[np.ndarray]] = {}
_bitrev_cache: dict[int, np.ndarray] = {}


def _twiddles(n: int, omega: int) -> list[np.ndarray]:
    """Per-stage Montgomery twiddle tables [(16, 1, 1, half)] for stage s."""
    key = (n, omega)
    if key not in _twiddle_cache:
        logn = n.bit_length() - 1
        tables = []
        for s in range(logn):
            half = 1 << s
            step = F.fr_pow(omega, n >> (s + 1))
            ws = [1] * half
            for j in range(1, half):
                ws[j] = ws[j - 1] * step % F.FR_MOD
            mont = [(w << 256) % F.FR_MOD for w in ws]
            tables.append(FJ.ints_to_limbs(mont).reshape(16, 1, half))
        _twiddle_cache[key] = tables
    return _twiddle_cache[key]


def _bitrev(n: int) -> np.ndarray:
    if n not in _bitrev_cache:
        _bitrev_cache[n] = bit_reverse_indices(n)
    return _bitrev_cache[n]


def _ntt_core_unrolled(a: jax.Array, n: int, omega: int) -> jax.Array:
    """Unrolled NTT body: a is (16, *batch, n); the transform runs along the
    last axis, batch dims ride for free. Fastest at runtime (every butterfly
    is a pure reshape — no gathers), but the graph holds log2(n) distinct
    mont_mul stages, so XLA compile time grows ~quadratically with log n.
    Used for small n; large n takes the scan path below."""
    logn = n.bit_length() - 1
    rev = jnp.asarray(_bitrev(n))
    x = jnp.take(a, rev, axis=-1)
    tables = _twiddles(n, omega)
    for s in range(logn):
        half = 1 << s
        groups = n // (2 * half)
        xg = x.reshape(x.shape[:-1] + (groups, 2, half))
        u = xg[..., 0, :]
        t = jnp.asarray(tables[s]).reshape((16,) + (1,) * (u.ndim - 2) + (half,))
        v = FJ.mont_mul(xg[..., 1, :], t)
        top = FJ.add_mod(u, v)
        bot = FJ.sub_mod(u, v)
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape[:-1] + (n,))
    return x


_scan_tables_cache: dict[tuple[int, int], tuple] = {}


def _scan_tables(n: int, omega: int):
    """Per-stage gather indices + full-width twiddles for the scan NTT.

    Returns (uidx, vidx, perm, tw): int32 (logn, n/2)×2, (logn, n) and
    uint32 (logn, 16, n/2) stacked so a ``lax.scan`` runs one uniform
    butterfly stage per step."""
    key = (n, omega)
    hit = _scan_tables_cache.get(key)
    if hit is not None:
        return hit
    logn = n.bit_length() - 1
    half_n = n // 2
    i = np.arange(half_n, dtype=np.int64)
    j = np.arange(n, dtype=np.int64)
    uidx = np.empty((logn, half_n), dtype=np.int32)
    vidx = np.empty((logn, half_n), dtype=np.int32)
    perm = np.empty((logn, n), dtype=np.int32)
    tw = np.empty((logn, NLIMBS_, half_n), dtype=np.uint32)
    for s in range(logn):
        half = 1 << s
        group = i // half
        off = i % half
        u = group * 2 * half + off
        uidx[s] = u
        vidx[s] = u + half
        # inverse map: position j reads stacked[top|bot] at pair index
        gj = j // (2 * half)
        oj = j % (2 * half)
        is_bot = oj >= half
        pair = gj * half + (oj - half * is_bot)
        perm[s] = pair + half_n * is_bot
        step = F.fr_pow(omega, n >> (s + 1))
        ws = [1] * half
        for t_ in range(1, half):
            ws[t_] = ws[t_ - 1] * step % F.FR_MOD
        mont = FJ.ints_to_limbs([(w << 256) % F.FR_MOD for w in ws])  # (16, half)
        tw[s] = np.tile(mont, (1, half_n // half))[:, :half_n]
    out = (uidx, vidx, perm, tw)
    _scan_tables_cache[key] = out
    return out


NLIMBS_ = FJ.NLIMBS


def _ntt_core_scan(a: jax.Array, n: int, omega: int) -> jax.Array:
    """Scan NTT body: one compiled butterfly stage re-run log2(n) times
    (stage tables are scanned-over constants). Compile time is O(1) in
    log n at the cost of three gathers per stage — the right trade for the
    k≥13 domains where the unrolled graph takes minutes to compile."""
    logn = n.bit_length() - 1
    rev = jnp.asarray(_bitrev(n))
    x = jnp.take(a, rev, axis=-1)
    uidx, vidx, perm, tw = _scan_tables(n, omega)

    def stage(x, tabs):
        ui, vi, pm, t = tabs
        u = jnp.take(x, ui, axis=-1)
        v = FJ.mont_mul(
            jnp.take(x, vi, axis=-1),
            t.reshape((NLIMBS_,) + (1,) * (x.ndim - 2) + (n // 2,)),
        )
        stacked = jnp.concatenate([FJ.add_mod(u, v), FJ.sub_mod(u, v)], axis=-1)
        return jnp.take(stacked, pm, axis=-1), None

    x, _ = jax.lax.scan(
        stage,
        x,
        (jnp.asarray(uidx), jnp.asarray(vidx), jnp.asarray(perm), jnp.asarray(tw)),
        length=logn,
    )
    return x


# Above this size the unrolled graph's XLA compile time dominates any
# runtime edge (measured: k=13 iNTT ≈ 190 s compile on a 4-core host, and
# worse through the remote TPU compile service).
SCAN_THRESHOLD = int(os.environ.get("CIRCUITS_NTT_SCAN_MIN", 1 << 12))

# Large-n strategy: "fourstep" or "scan" (CIRCUITS_NTT_IMPL overrides). The
# four-step keeps the unrolled reshape-only butterflies (no gathers) on
# sqrt(n)-sized factors; the scan path pays 3 full-width gathers per stage
# but compiles one stage. Measured k=13 B=8: TPU v5e scan 675 s compile /
# 22.6 ms warm vs fourstep 40 s / 29.3 ms — the compile gap (gather
# lowering) dominates for every fresh (n, omega, batch) shape, so TPU
# defaults to fourstep; XLA:CPU compiles the scan stage in seconds and runs
# it 1.7x faster than fourstep's transposes, so CPU defaults to scan.
_VALID_LARGE_IMPLS = ("scan", "fourstep")


def _large_impl() -> str:
    """Large-n strategy, resolved per call (a process whose first large NTT
    runs under a CPU-forced context must not pin the choice for later TPU
    calls — jax.default_backend() is cheap and context-sensitive)."""
    env = os.environ.get("CIRCUITS_NTT_IMPL")
    if env:
        if env not in _VALID_LARGE_IMPLS:
            raise ValueError(
                f"CIRCUITS_NTT_IMPL={env!r}: expected one of {_VALID_LARGE_IMPLS}"
            )
        return env
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    return "scan" if backend == "cpu" else "fourstep"

_fourstep_tw_cache: dict[tuple[int, int, int], np.ndarray] = {}


def _fourstep_twiddles(n1: int, n2: int, omega: int) -> np.ndarray:
    """ω^{k1·j2} as a (16, n1, n2) Montgomery limb tensor (k1 rows)."""
    key = (n1, n2, omega)
    hit = _fourstep_tw_cache.get(key)
    if hit is not None:
        return hit
    p = F.FR_MOD
    col = [1] * n1  # ω^{k1}
    for i in range(1, n1):
        col[i] = col[i - 1] * omega % p
    rows = np.empty((16, n1, n2), dtype=np.uint32)
    for k1 in range(n1):
        w = col[k1]
        vals = [1] * n2
        for j2 in range(1, n2):
            vals[j2] = vals[j2 - 1] * w % p
        rows[:, k1, :] = FJ.ints_to_limbs([(v << 256) % p for v in vals])
    _fourstep_tw_cache[key] = rows
    return rows


def _ntt_core_fourstep(a: jax.Array, n: int, omega: int) -> jax.Array:
    """Single-device four-step (Bailey) NTT: n = n1·n2, two batched
    sqrt(n)-point transforms (reshape-only butterflies — no gathers) around
    one pointwise twiddle multiply and two transposes.

    Index bookkeeping (same convention as ``parallel/ntt_sharded``):
    input a[j1·n2 + j2] viewed as an (n1, n2) matrix; output
    A[k1 + n1·k2] = Σ_{j2} ω^{j2·k1}·(ω^{n1})^{j2·k2}
                    · Σ_{j1} a[j1·n2 + j2]·(ω^{n2})^{j1·k1}.
    Compile cost is that of two log2(sqrt n)-stage unrolled graphs; runtime
    avoids the 3·log2(n) full-width gathers of the scan path."""
    logn = n.bit_length() - 1
    log_n2 = (logn + 1) // 2
    n2 = 1 << log_n2
    n1 = n >> log_n2
    batch = a.shape[1:-1]
    x = a.reshape(a.shape[:-1] + (n1, n2))
    x = jnp.swapaxes(x, -1, -2)                  # (…, j2, j1)
    x = _ntt_core(x, n1, F.fr_pow(omega, n2))    # step 1 → (…, j2, k1)
    x = jnp.swapaxes(x, -1, -2)                  # (…, k1, j2)
    tw = jnp.asarray(_fourstep_twiddles(n1, n2, omega))
    x = FJ.mont_mul(x, tw.reshape((16,) + (1,) * len(batch) + (n1, n2)))
    x = _ntt_core(x, n2, F.fr_pow(omega, n1))    # step 3 → (…, k1, k2)
    x = jnp.swapaxes(x, -1, -2)                  # (…, k2, k1): flat k1 + n1·k2
    return x.reshape(a.shape)


def _ntt_core(a: jax.Array, n: int, omega: int) -> jax.Array:
    if n >= SCAN_THRESHOLD:
        if _large_impl() == "scan":
            return _ntt_core_scan(a, n, omega)
        return _ntt_core_fourstep(a, n, omega)
    return _ntt_core_unrolled(a, n, omega)


@functools.partial(jax.jit, static_argnames=("n", "omega"))
def _ntt_device(a: jax.Array, n: int, omega: int) -> jax.Array:
    """a: (16, *batch, n) Montgomery limbs. Static (n, omega) → cached."""
    return _ntt_core(a, n, omega)


# Minimum size to shard a transform over the mesh: below this, the
# all_to_all + shard bookkeeping costs more than one device just doing it.
SHARD_THRESHOLD = int(os.environ.get("CIRCUITS_NTT_SHARD_MIN", 1 << 12))


def _shard_mesh(n: int):
    from ..parallel import auto as _auto

    mesh = _auto.get_mesh()
    if mesh is None or n < SHARD_THRESHOLD:
        return None
    nd = mesh.devices.size
    # four-step needs n2 (≥ sqrt(n)) divisible by the mesh
    if n < nd * nd:
        return None
    return mesh


def ntt(a: jax.Array, omega: int) -> jax.Array:
    """Device NTT on a (16, *batch, n) Montgomery limb tensor (last axis).

    Shards the transform over the active mesh (parallel/ntt_sharded
    four-step, one all_to_all) when one is configured and n is large."""
    n = int(a.shape[-1])
    mesh = _shard_mesh(n)
    if mesh is not None:
        from ..parallel import ntt_sharded as _NS

        return _NS.ntt_sharded_batched(mesh, a, omega)
    return _ntt_device(a, n, omega)


@functools.partial(jax.jit, static_argnames=("n",))
def _intt_scale(res: jax.Array, n: int) -> jax.Array:
    c = jnp.asarray(FJ.FR.const(F.fr_inv(n))).reshape((16,) + (1,) * (res.ndim - 1))
    return FJ.mont_mul(res, c)


def intt(a: jax.Array, omega: int) -> jax.Array:
    """Inverse device NTT (includes the n^{-1} scale)."""
    n = int(a.shape[-1])
    mesh = _shard_mesh(n)
    if mesh is not None:
        from ..parallel import ntt_sharded as _NS

        return _intt_scale(_NS.ntt_sharded_batched(mesh, a, F.fr_inv(omega)), n)
    res = _ntt_device(a, n, F.fr_inv(omega))
    return _intt_scale(res, n)

"""Distributed NTT over a device mesh — the SP/CP analogue (SURVEY §2c #3).

Replaces the single-host rayon FFT of the reference's halo2 fork
(`halo2_proofs::arithmetic::best_fft`, SURVEY §2b) for transform sizes
beyond one chip. Algorithm: four-step (Bailey) decomposition n = n1·n2 with
the matrix sharded over columns:

    input  a[j],   j = j1·n2 + j2            (row-major n1×n2 matrix)
    output A[k],   k = k1 + n1·k2

    A[k1 + n1·k2] = Σ_{j2} ω^{j2·k1} · (ω^{n1})^{j2·k2}
                    · Σ_{j1} a[j1·n2 + j2] · (ω^{n2})^{j1·k1}

    1. length-n1 DFTs along the row axis (local: each shard holds whole
       columns), root ω^{n2}
    2. pointwise twiddle ω^{j2·k1} (local)
    3. shard exchange — one tiled all_to_all over the mesh axis (the only
       collective; rides ICI on a slice)
    4. length-n2 DFTs along the column axis (local), root ω^{n1}

Every local stage reuses the single-chip radix-2 kernel (`ops/ntt._ntt_core`)
with a batch dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..ops import field as F
from ..ops import field_jax as FJ
from ..ops import ntt as NTT

P = F.FR_MOD

_tw_cache: dict[tuple[int, int, int], np.ndarray] = {}


def _twiddle_matrix(n1: int, n2: int, omega: int) -> np.ndarray:
    """ω^{j2·k1} as a (16, n1, n2) Montgomery limb tensor (k1 rows)."""
    key = (n1, n2, omega)
    if key not in _tw_cache:
        col = [1] * n1  # ω^{k1} powers
        for i in range(1, n1):
            col[i] = col[i - 1] * omega % P
        rows = np.empty((16, n1, n2), dtype=np.uint32)
        for k1 in range(n1):
            w = col[k1]
            vals = [1] * n2
            for j2 in range(1, n2):
                vals[j2] = vals[j2 - 1] * w % P
            rows[:, k1, :] = FJ.ints_to_limbs([(v << 256) % P for v in vals])
        _tw_cache[key] = rows
    return _tw_cache[key]


def ntt_sharded(mesh: Mesh, a: jax.Array, omega: int, axis: str = "shard"):
    """Distributed DFT of a (16, n) Montgomery limb tensor.

    n must factor as n1·n2 with n2 divisible by the mesh size. Returns the
    (16, n) transform, sharded over the mesh on the flat output axis.
    """
    n = int(a.shape[-1])
    ndev = mesh.devices.size
    logn = n.bit_length() - 1
    # pick n2 ≥ ndev, split roughly square for balanced local transforms
    log_n2 = max((logn + 1) // 2, (ndev - 1).bit_length())
    n2 = 1 << log_n2
    n1 = n // n2
    assert n1 * n2 == n and n2 % ndev == 0, (n1, n2, ndev)

    mat = jax.device_put(a.reshape(16, n1, n2), NamedSharding(mesh, PSpec(None, None, axis)))
    tw = jnp.asarray(_twiddle_matrix(n1, n2, omega))
    tw = jax.device_put(tw, NamedSharding(mesh, PSpec(None, None, axis)))

    out = _four_step(mesh, axis, n1, n2, omega)(mat, tw)  # (16, n2, n1) sharded on k1
    return out.reshape(16, n)


@functools.lru_cache(maxsize=16)
def _four_step(mesh: Mesh, axis: str, n1: int, n2: int, omega: int):
    """One jitted shard_map four-step NTT per (mesh, axis, n1, n2, omega).

    The jit wrapper matters: an eager shard_map compiles every inner
    primitive as a separate XLA program; under jit the whole transform is a
    single compile (and the lru_cache keeps the jitted callable's identity
    stable so repeat calls don't retrace)."""
    omega_n1 = F.fr_pow(omega, n1)
    omega_n2 = F.fr_pow(omega, n2)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PSpec(None, None, axis), PSpec(None, None, axis)),
        out_specs=PSpec(None, None, axis),
        check_vma=False,
    )
    def _run(local, tw_local):
        # local: (16, n1, n2/ndev) — full columns of the shard's j2 range
        x = jnp.swapaxes(local, 1, 2)          # (16, n2loc, n1)
        x = NTT._ntt_core(x, n1, omega_n2)      # step 1: k1 along last axis
        x = jnp.swapaxes(x, 1, 2)               # (16, n1, n2loc)
        x = FJ.mont_mul(x, tw_local)            # step 2: ω^{j2·k1}
        # step 3: all_to_all — reshard from j2-split to k1-split
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)
        # x: (16, n1/ndev, n2)
        x = NTT._ntt_core(x, n2, omega_n1)      # step 4: k2 along last axis
        # flat output index is k1 + n1·k2, i.e. the (n2, n1) matrix [k2][k1]
        # row-major; each shard holds a contiguous k1 block → shard the
        # transposed matrix on its last (k1) axis.
        return jnp.swapaxes(x, 1, 2)            # (16, n2, n1loc)

    return jax.jit(_run)


def ntt_sharded_batched(mesh: Mesh, a: jax.Array, omega: int, axis: str = "shard"):
    """Four-step DFT of a (16, *batch, n) Montgomery limb tensor over the
    mesh — the prover-facing entry (ops/ntt routes here when a mesh is
    active and the transform is large enough to shard)."""
    shape = a.shape
    n = int(shape[-1])
    ndev = mesh.devices.size
    logn = n.bit_length() - 1
    log_n2 = max((logn + 1) // 2, (ndev - 1).bit_length())
    n2 = 1 << log_n2
    n1 = n // n2
    assert n1 * n2 == n and n2 % ndev == 0, (n1, n2, ndev)
    b = 1
    for d in shape[1:-1]:
        b *= int(d)

    mat = jax.device_put(
        a.reshape(16, b, n1, n2), NamedSharding(mesh, PSpec(None, None, None, axis))
    )
    tw = jax.device_put(
        jnp.asarray(_twiddle_matrix(n1, n2, omega)),
        NamedSharding(mesh, PSpec(None, None, axis)),
    )
    out = _four_step_batched(mesh, axis, n1, n2, omega)(mat, tw)
    return out.reshape(shape)


@functools.lru_cache(maxsize=16)
def _four_step_batched(mesh: Mesh, axis: str, n1: int, n2: int, omega: int):
    """Batched variant of _four_step: operand (16, B, n1, n2), j2 sharded."""
    omega_n1 = F.fr_pow(omega, n1)
    omega_n2 = F.fr_pow(omega, n2)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PSpec(None, None, None, axis), PSpec(None, None, axis)),
        out_specs=PSpec(None, None, None, axis),
        check_vma=False,
    )
    def _run(local, tw_local):
        # local: (16, B, n1, n2/ndev)
        x = jnp.swapaxes(local, 2, 3)           # (16, B, n2loc, n1)
        x = NTT._ntt_core(x, n1, omega_n2)       # step 1
        x = jnp.swapaxes(x, 2, 3)                # (16, B, n1, n2loc)
        x = FJ.mont_mul(x, tw_local[:, None])    # step 2
        x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=3, tiled=True)
        x = NTT._ntt_core(x, n2, omega_n1)       # step 4: (16, B, n1/ndev, n2)
        return jnp.swapaxes(x, 2, 3)             # (16, B, n2, n1loc)

    return jax.jit(_run)


def ntt_sharded_host(mesh: Mesh, values: list[int], omega: int) -> list[int]:
    """Host ints in/out convenience wrapper (tests)."""
    a = jnp.asarray(FJ.ints_to_limbs([(v << 256) % P for v in values]))
    out = ntt_sharded(mesh, a, omega)
    rinv = pow(1 << 256, -1, P)
    return [v * rinv % P for v in FJ.limbs_to_ints(np.asarray(out))]

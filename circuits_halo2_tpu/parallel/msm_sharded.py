"""Distributed MSM over a device mesh — the TP analogue (SURVEY §2c #2).

Replaces the rayon-parallel Pippenger of the reference's halo2 fork
(`best_multiexp`, SURVEY §2b) with point/scalar index sharding: every device
runs the full bucketed Pippenger (`ops/msm._pippenger_core`) on its point
shard, producing one Jacobian partial per MSM; partials are combined by an
`all_gather` over the mesh axis followed by a log-depth Jacobian tree sum
(EC addition is not a `psum`-able monoid, so the all-reduce is gather+fold —
ndev·3·16 words over ICI, negligible next to the shard compute).

Horner window folding commutes with the shard sum (it is linear in the
per-window bucket sums), so each shard folds its own windows before the
single collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..ops import field as F
from ..ops import field_jax as FJ
from ..ops import msm as M


@functools.lru_cache(maxsize=8)
def _sharded_pippenger(mesh: Mesh, axis: str):
    """One jitted shard_map Pippenger per (mesh, axis).

    The jit wrapper is essential: an eager shard_map compiles every inner
    primitive as its own XLA program (dozens of small LLVM compiles on CPU);
    under jit the whole sharded MSM is a single compile."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            PSpec(None, axis),
            PSpec(None, axis),
            PSpec(axis),
            PSpec(None, None, axis),
        ),
        out_specs=(PSpec(None, None), PSpec(None, None), PSpec(None, None)),
        check_vma=False,
    )
    def _run(xs_l, ys_l, valid_l, digits_l):
        part = M._pippenger_core(xs_l, ys_l, valid_l, digits_l)  # (16, B) ×3
        # gather partials: (ndev, 16, B) → (16, B, ndev) → tree fold
        g = [
            jnp.moveaxis(jax.lax.all_gather(c, axis, tiled=False), 0, -1)
            for c in part
        ]
        out = M._tree_sum_last(tuple(g))
        return tuple(c[..., 0] for c in out)

    return jax.jit(_run)


def msm_sharded_device(mesh: Mesh, xs, ys, valid, digits, axis: str = "shard"):
    """Device-array entry: xs, ys (16, n); valid (n,); digits (B, NWIN, n),
    n divisible by the mesh size. Returns a (16, B) Jacobian triple
    (replicated)."""
    return _sharded_pippenger(mesh, axis)(xs, ys, valid, digits)


@functools.lru_cache(maxsize=8)
def _sharded_commit(mesh: Mesh, axis: str):
    """Sharded analogue of ops/msm._commit_dev: Montgomery scalar columns →
    local digit extraction → local Pippenger → all_gather + Jacobian fold.
    This is the prover's commitment seam (every advice/lookup/grand-product/
    quotient commitment) running over the mesh."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            PSpec(None, axis),
            PSpec(None, axis),
            PSpec(axis),
            PSpec(None, None, axis),
        ),
        out_specs=(PSpec(None, None), PSpec(None, None), PSpec(None, None)),
        check_vma=False,
    )
    def _run(xs_l, ys_l, valid_l, scal_l):
        digits = M.digits_from_mont(scal_l)  # (B, NWIN, nloc)
        part = M._pippenger_core(xs_l, ys_l, valid_l, digits)
        g = [
            jnp.moveaxis(jax.lax.all_gather(c, axis, tiled=False), 0, -1)
            for c in part
        ]
        out = M._tree_sum_last(tuple(g))
        return tuple(c[..., 0] for c in out)

    return jax.jit(_run)


def commit_sharded_device(mesh: Mesh, xs, ys, valid, scal_mont, axis: str = "shard"):
    """xs, ys (16, n); valid (n,); scal_mont (16, B, n) Montgomery columns
    (pre-padded to the base lane count n, n % mesh size == 0). Returns a
    (16, B) Jacobian triple (replicated)."""
    shard2 = NamedSharding(mesh, PSpec(None, axis))
    xs = jax.device_put(xs, shard2)
    ys = jax.device_put(ys, shard2)
    valid = jax.device_put(valid, NamedSharding(mesh, PSpec(axis)))
    scal_mont = jax.device_put(scal_mont, NamedSharding(mesh, PSpec(None, None, axis)))
    return _sharded_commit(mesh, axis)(xs, ys, valid, scal_mont)


def msm_sharded(mesh: Mesh, points, scalar_rows, axis: str = "shard"):
    """Host-facing batched MSM across the mesh.

    points: host affine list; scalar_rows: B scalar vectors. Points are
    padded so the lane count divides the mesh; returns B host affine points
    (or None for infinity). Mirrors `ops/msm.msm_pippenger_device` but with
    the point axis sharded over devices.
    """
    ndev = mesh.devices.size
    xs, ys, valid = M.precompute_bases(points)
    n = int(xs.shape[1])
    # every shard needs ≥ 256 lanes (chunked-scan minimum) and equal size
    target = max(n, 256 * ndev)
    if target % ndev:
        target += ndev - target % ndev
    if target > n:
        pad = target - n
        zeros = jnp.zeros((16, pad), jnp.uint32)
        xs = jnp.concatenate([xs, zeros], axis=1)
        ys = jnp.concatenate([ys, zeros], axis=1)
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
        n = target
    nmsm = 1 << (max(1, len(scalar_rows)) - 1).bit_length()
    rows = list(scalar_rows) + [[0]] * (nmsm - len(scalar_rows))
    digits = jnp.asarray(M._scalars_to_digits(rows, n))

    sh = NamedSharding(mesh, PSpec(None, axis))
    xs = jax.device_put(xs, sh)
    ys = jax.device_put(ys, sh)
    valid = jax.device_put(valid, NamedSharding(mesh, PSpec(axis)))
    digits = jax.device_put(digits, NamedSharding(mesh, PSpec(None, None, axis)))

    acc = msm_sharded_device(mesh, xs, ys, valid, digits, axis)
    ax, ay, az = np.asarray(acc[0]), np.asarray(acc[1]), np.asarray(acc[2])
    return [
        M.jac_to_affine_host((ax[:, i : i + 1], ay[:, i : i + 1], az[:, i : i + 1]))
        for i in range(len(scalar_rows))
    ]

"""Multi-chip sharding strategies (SURVEY §2c).

The reference's only parallelism is single-host rayon; the TPU-native
scaling axes are:

- data-parallel witness generation: leaves sharded over the mesh, Poseidon
  batches fully local (`shard_map`, no collectives until the reduction);
- log-depth tree reduction: per-level pairwise hashing, with an all-gather
  once a level no longer fills the mesh;
- MSM partial-sum sharding (the TP analogue): point/scalar shards produce
  local Jacobian partials, combined by a tiny gather + host fold;
- distributed NTT (the SP analogue): butterfly stages local until the span
  exceeds the shard, then axis exchange (planned: ppermute stages).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..ops import poseidon
from ..ops import field_jax as FJ


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (axis,))


@functools.lru_cache(maxsize=8)
def _hash_fn(mesh: Mesh, axis: str):
    sharding = NamedSharding(mesh, PSpec(None, None, axis))
    return jax.jit(
        poseidon.hash_batch,
        in_shardings=sharding,
        out_shardings=NamedSharding(mesh, PSpec(None, axis)),
    )


def sharded_hash_batch(mesh: Mesh, inputs: jax.Array, axis: str = "shard"):
    """Batched Poseidon with the batch dimension sharded over the mesh.

    inputs: (L, 16, N) Montgomery limbs, N divisible by mesh size.
    Purely local compute — XLA partitions the batch axis; no collectives.
    """
    inputs = jax.device_put(inputs, NamedSharding(mesh, PSpec(None, None, axis)))
    return _hash_fn(mesh, axis)(inputs)


def sharded_tree_step(mesh: Mesh, hashes: jax.Array, balances: jax.Array,
                      axis: str = "shard"):
    """One Merkle-sum level: pair adjacent nodes, sum balances, hash.

    hashes: (16, N); balances: (16, C, N) — limbs leading everywhere.
    Returns ((16, N/2), (16, C, N/2)). Pairing is a strided slice; XLA
    inserts the boundary exchange when a pair spans two shards (ICI halo
    exchange), so the same code runs at every level of the reduction.
    """
    c = balances.shape[1]
    left_h, right_h = hashes[:, 0::2], hashes[:, 1::2]
    left_b, right_b = balances[:, :, 0::2], balances[:, :, 1::2]
    sums = FJ.add_mod(left_b, right_b)
    parts = [sums[:, i, :] for i in range(c)] + [left_h, right_h]
    preimage = jnp.stack(parts, axis=0)  # (C+2, 16, N/2)
    new_hashes = poseidon.hash_batch(preimage)
    return new_hashes, sums


def tree_reduce_levels(hashes: jax.Array, balances: jax.Array):
    """Full log-depth Merkle-sum reduction inside ONE compiled graph.

    Shape-preserving trick: every level pairs the valid prefix (stride-2
    slices over the FULL width), compacts results into the front half and
    zero-pads the tail, so the carry keeps a constant shape and all
    log2(N) levels run under a single ``lax.scan`` — one XLA compile total
    (the reference's rayon loop `build_tree.rs:54-78` recurses on halved
    vectors instead). The wasted tail hashes cost N/2·log N vs N total —
    acceptable on-device; the host/production builders compact for real.

    hashes: (16, N); balances: (16, C, N), N a power of two.
    Returns ((16, 1), (16, C, 1)) root hash + root balance sums.
    """
    n = hashes.shape[-1]
    c = balances.shape[1]
    half, rest = n // 2, n - n // 2

    def level(carry, _):
        h, b = carry
        left_h, right_h = h[:, 0::2], h[:, 1::2]
        left_b, right_b = b[:, :, 0::2], b[:, :, 1::2]
        sums = FJ.add_mod(left_b, right_b)
        parts = [sums[:, i, :] for i in range(c)] + [left_h, right_h]
        new_h = poseidon.hash_batch(jnp.stack(parts, axis=0))
        h = jnp.concatenate([new_h, jnp.zeros_like(h[:, :rest])], axis=-1)
        b = jnp.concatenate([sums, jnp.zeros_like(b[:, :, :rest])], axis=-1)
        return (h, b), None

    levels = (n - 1).bit_length()
    (h, b), _ = jax.lax.scan(level, (hashes, balances), None, length=levels)
    return h[:, :1], b[:, :, :1]


def sharded_tree_reduce(mesh: Mesh, leaf_hashes, leaf_balances, axis="shard"):
    """Full log-depth reduction to the root on a sharded mesh.

    Inputs sharded over the leaf axis; output (the root) is replicated.
    The whole reduction is one jit — XLA inserts the cross-shard halo
    exchanges for the stride-2 pairings as the level span grows.
    """
    return _reduce_fn(mesh, axis)(leaf_hashes, leaf_balances)


@functools.lru_cache(maxsize=8)
def _reduce_fn(mesh: Mesh, axis: str):
    shard_h = NamedSharding(mesh, PSpec(None, axis))
    shard_b = NamedSharding(mesh, PSpec(None, None, axis))
    rep = NamedSharding(mesh, PSpec())
    return jax.jit(
        tree_reduce_levels,
        in_shardings=(shard_h, shard_b),
        out_shardings=(rep, rep),
    )

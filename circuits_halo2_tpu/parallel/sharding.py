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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..ops import poseidon
from ..ops import field_jax as FJ


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (axis,))


def sharded_hash_batch(mesh: Mesh, inputs: jax.Array, axis: str = "shard"):
    """Batched Poseidon with the batch dimension sharded over the mesh.

    inputs: (L, 16, N) Montgomery limbs, N divisible by mesh size.
    Purely local compute — XLA partitions the batch axis; no collectives.
    """
    sharding = NamedSharding(mesh, PSpec(None, None, axis))
    inputs = jax.device_put(inputs, sharding)
    fn = jax.jit(
        poseidon.hash_batch,
        in_shardings=sharding,
        out_shardings=NamedSharding(mesh, PSpec(None, axis)),
    )
    return fn(inputs)


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


def sharded_tree_reduce(mesh: Mesh, leaf_hashes, leaf_balances, axis="shard"):
    """Full log-depth reduction to the root on a sharded mesh."""
    nd = mesh.devices.size
    h, b = leaf_hashes, leaf_balances

    step = jax.jit(
        lambda hh, bb: sharded_tree_step(mesh, hh, bb, axis),
    )
    while h.shape[-1] > 1:
        if h.shape[-1] <= nd:
            # too small to shard: replicate and finish locally
            rep = NamedSharding(mesh, PSpec())
            h = jax.device_put(h, rep)
            b = jax.device_put(b, rep)
        h, b = step(h, b)
    return h, b

"""Poseidon hash over BN254-Fr — t=2 (rate 1), 8 full / 56 partial rounds, x^5.

Semantics match the reference's witness-side hash exactly
(`zk_prover/src/chips/poseidon/poseidon_spec.rs:14-38` +
halo2_gadgets ``poseidon::primitives`` sponge with ``ConstantLength<L>``):

- permutation: 4 full rounds, 56 partial, 4 full; full round applies
  ``x -> (x + rc)^5`` to both state words then MDS; a partial round adds both
  round constants, S-boxes only word 0, then MDS.
- sponge (rate 1): state = [0, (L << 64)]; for each message word m:
  ``state[0] += m``; permute. Digest is ``state[0]``.

Two implementations:
- host path (Python ints) for one-off hashes in the proof pipeline;
- batched JAX path over limb tensors (``(16, N)`` uint32, Montgomery form)
  for the Merkle-tree hot loop (replaces the reference's rayon
  parallelism in `zk_prover/src/merkle_sum_tree/utils/build_tree.rs:29-78`).

Constants are loaded from ``poseidon_constants.json`` (extracted protocol
parameters, independently re-derived by ``grain.py`` — see tests).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_jax as FJ

T = 2
RATE = 1
R_FULL = 8
R_PARTIAL = 56
N_ROUNDS = R_FULL + R_PARTIAL

_data = json.loads(
    (Path(__file__).parent / "poseidon_constants.json").read_text()
)
ROUND_CONSTANTS: list[list[int]] = [
    [int(a, 16), int(b, 16)] for a, b in _data["round_constants"]
]
MDS: list[list[int]] = [[int(x, 16) for x in row] for row in _data["mds"]]
MDS_INV: list[list[int]] = [[int(x, 16) for x in row] for row in _data["mds_inv"]]


# ---------------------------------------------------------------------------
# Host path (Python ints)
# ---------------------------------------------------------------------------

def permute(state: list[int]) -> list[int]:
    """One Poseidon permutation on a 2-word state of Fr ints."""
    p = F.FR_MOD
    s0, s1 = state
    half = R_FULL // 2

    def full_round(s0, s1, rc):
        s0 = pow((s0 + rc[0]) % p, 5, p)
        s1 = pow((s1 + rc[1]) % p, 5, p)
        return (
            (MDS[0][0] * s0 + MDS[0][1] * s1) % p,
            (MDS[1][0] * s0 + MDS[1][1] * s1) % p,
        )

    def partial_round(s0, s1, rc):
        s0 = pow((s0 + rc[0]) % p, 5, p)
        s1 = (s1 + rc[1]) % p
        return (
            (MDS[0][0] * s0 + MDS[0][1] * s1) % p,
            (MDS[1][0] * s0 + MDS[1][1] * s1) % p,
        )

    r = 0
    for _ in range(half):
        s0, s1 = full_round(s0, s1, ROUND_CONSTANTS[r])
        r += 1
    for _ in range(R_PARTIAL):
        s0, s1 = partial_round(s0, s1, ROUND_CONSTANTS[r])
        r += 1
    for _ in range(half):
        s0, s1 = full_round(s0, s1, ROUND_CONSTANTS[r])
        r += 1
    return [s0, s1]


def hash_n(inputs: list[int]) -> int:
    """ConstantLength<L> Poseidon hash of L field elements (host path)."""
    from ..native import available as _native_ok, poseidon_hash_batch

    if _native_ok():
        return poseidon_hash_batch([[x % F.FR_MOD for x in inputs]], len(inputs))[0]
    return _hash_n_py(inputs)


def _hash_n_py(inputs: list[int]) -> int:
    length = len(inputs)
    state = [0, (length << 64) % F.FR_MOD]
    for m in inputs:
        state[0] = (state[0] + m) % F.FR_MOD
        state = permute(state)
    return state[0]


# ---------------------------------------------------------------------------
# Batched JAX path
# ---------------------------------------------------------------------------

def _mont(x: int) -> int:
    return (x << 256) % F.FR_MOD


# Device constant tables (Montgomery form): (rounds, t, 16, 1) and (2, 2, 16, 1).
_RC_MONT = np.stack(
    [
        np.stack([FJ.int_to_limbs(_mont(c)).reshape(16, 1) for c in row])
        for row in ROUND_CONSTANTS
    ]
)
_MDS_MONT = np.stack(
    [np.stack([FJ.int_to_limbs(_mont(c)).reshape(16, 1) for c in row]) for row in MDS]
)


def _apply_mds(s0, s1):
    m = _MDS_MONT
    n0 = FJ.add_mod(FJ.mont_mul(jnp.asarray(m[0, 0]), s0), FJ.mont_mul(jnp.asarray(m[0, 1]), s1))
    n1 = FJ.add_mod(FJ.mont_mul(jnp.asarray(m[1, 0]), s0), FJ.mont_mul(jnp.asarray(m[1, 1]), s1))
    return n0, n1


# Per-round full/partial flags: 4 full, 56 partial, 4 full.
_IS_FULL = np.zeros(N_ROUNDS, dtype=np.bool_)
_IS_FULL[: R_FULL // 2] = True
_IS_FULL[-(R_FULL // 2):] = True


def permute_batch(s0: jax.Array, s1: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched permutation; s0, s1: (16, *batch) uint32 Montgomery limbs.

    All 64 rounds run under ONE lax.scan with a per-round is-full flag
    (``s1`` is S-boxed only in full rounds). A single unified round body
    keeps the compiled graph ~10x smaller than separate full/partial scans
    — XLA:CPU codegen of one round body is ~6 s; the driver's cold-cache
    multichip dryrun budget can't afford nine of them. The extra pow5 on
    partial rounds is dead weight only on this exact XLA path; the
    production TPU engine is ops/poseidon_pallas2."""

    def round_fn(carry, xs):
        rc, is_full = xs
        s0, s1 = carry
        s0 = FJ.pow5(FJ.add_mod(s0, rc[0]))
        u = FJ.add_mod(s1, rc[1])
        s1 = FJ.select(jnp.broadcast_to(is_full, u.shape[1:]), FJ.pow5(u), u)
        return _apply_mds(s0, s1), None

    rc = jnp.asarray(_RC_MONT)
    (s0, s1), _ = jax.lax.scan(
        round_fn, (s0, s1), (rc, jnp.asarray(_IS_FULL))
    )
    return s0, s1


def hash_batch(inputs: jax.Array) -> jax.Array:
    """Batched ConstantLength<L> hash.

    inputs: (L, 16, *batch) uint32 Montgomery limbs (L message words each).
    Returns (16, *batch) Montgomery digest. Absorption scans over the L
    message words so the permutation body is traced/compiled exactly once
    regardless of message length.
    """
    length = inputs.shape[0]
    batch = inputs.shape[2:]
    s0 = jnp.zeros((16,) + batch, jnp.uint32)
    cap = jnp.broadcast_to(jnp.asarray(FJ.FR.const(length << 64)), (16,) + batch).astype(jnp.uint32)

    def absorb(carry, x):
        s0, s1 = carry
        s0, s1 = permute_batch(FJ.add_mod(s0, x), s1)
        return (s0, s1), None

    (s0, _), _ = jax.lax.scan(absorb, (s0, cap), inputs)
    return s0


@functools.partial(jax.jit, static_argnames=())
def hash_batch_jit(inputs: jax.Array) -> jax.Array:
    return hash_batch(inputs)


# Fixed chunk size: every device dispatch sees the same shape, so the whole
# tree build compiles exactly twice (L=3 leaves, L=4 middles) regardless of
# tree size. 4096 lanes fills the VPU and keeps VMEM pressure low.
CHUNK = 4096


def hash_batch_chunked(arr: np.ndarray) -> np.ndarray:
    """Hash (L, 16, n) limbs in fixed-size chunks; returns (16, n) limbs."""
    length, _, n = arr.shape
    pad = (-n) % CHUNK
    if pad:
        arr = np.concatenate(
            [arr, np.zeros((length, 16, pad), dtype=np.uint32)], axis=-1
        )
    outs = []
    for i in range(0, n + pad, CHUNK):
        outs.append(np.asarray(hash_batch_jit(jnp.asarray(arr[:, :, i : i + CHUNK]))))
    return np.concatenate(outs, axis=-1)[:, :n]


def hash_many(inputs_ints: list[list[int]]) -> list[int]:
    """Convenience: hash N same-length messages of ints via the device path."""
    length = len(inputs_ints[0])
    n = len(inputs_ints)
    arr = np.zeros((length, 16, n), dtype=np.uint32)
    for j, msg in enumerate(inputs_ints):
        assert len(msg) == length
        for i, word in enumerate(msg):
            arr[i, :, j] = FJ.int_to_limbs(_mont(word))
    digest = hash_batch_chunked(arr)
    vals = FJ.limbs_to_ints(np.asarray(digest))
    rinv = pow(1 << 256, -1, F.FR_MOD)
    return [(v * rinv) % F.FR_MOD for v in vals]

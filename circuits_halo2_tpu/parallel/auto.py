"""Mesh policy — when does the prover shard over devices?

The reference scales with rayon threads inside one host
(`build_tree.rs:39,61`; `maybe-rayon` in the halo2 fork's FFT/MSM). The
TPU-native analogue is a 1-D device mesh over which the hot kernels shard:
MSM by point index (parallel/msm_sharded), NTT by four-step columns
(parallel/ntt_sharded), witness hashing by leaf index (parallel/sharding).

Policy (env ``CIRCUITS_TPU_SHARD``):

- ``1``    — always shard over all visible devices (tests use this on the
             8-device virtual CPU mesh).
- ``0``    — never shard (single-device paths only).
- ``auto`` — shard iff more than one REAL accelerator device is visible
             (default; virtual CPU devices are opt-in because XLA:CPU
             collectives cost more than they parallelize on one host).

``set_mesh`` overrides the policy programmatically (pass ``None`` to clear).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "shard"

_override: Mesh | None = None
_override_set = False
_auto_mesh: Mesh | None = None
_auto_checked = False


def set_mesh(mesh: Mesh | None) -> None:
    """Force a specific mesh (or None to disable sharding) regardless of env."""
    global _override, _override_set, _auto_checked, _auto_mesh
    _override = mesh
    _override_set = mesh is not None
    if mesh is None:
        _auto_checked = False
        _auto_mesh = None


def get_mesh() -> Mesh | None:
    """The active sharding mesh, or None for single-device execution."""
    global _auto_mesh, _auto_checked
    if _override_set:
        return _override
    mode = os.environ.get("CIRCUITS_TPU_SHARD", "auto")
    if mode == "0":
        return None
    if not _auto_checked:
        _auto_checked = True
        try:
            devices = jax.devices()
        except Exception:
            return None
        if len(devices) > 1 and (
            mode == "1" or devices[0].platform not in ("cpu",)
        ):
            _auto_mesh = Mesh(np.array(devices), (AXIS,))
    return _auto_mesh


def ndev() -> int:
    mesh = get_mesh()
    return mesh.devices.size if mesh is not None else 1

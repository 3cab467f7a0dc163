"""Native host runtime (C++) — ctypes bindings.

The TPU device path is JAX/XLA/Pallas; this module is the native layer for
the host side of the pipeline, mirroring what the reference implements in
Rust (SURVEY.md §2b: halo2curves field/curve arithmetic, `best_multiexp`
Pippenger, keccak username hashing, SRS generation).

The shared library is built from ``fieldcc.cpp`` on first use with g++ and
cached next to the source; set ``CIRCUITS_TPU_NO_NATIVE=1`` to force the
pure-Python fallbacks (every caller must degrade gracefully).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "fieldcc.cpp"
_LIB = _HERE / "_fieldcc.so"
_ABI_VERSION = 5

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get() -> ctypes.CDLL | None:
    """The loaded library, or None if native support is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CIRCUITS_TPU_NO_NATIVE"):
            return None
        stale = (
            not _LIB.exists()
            or _LIB.stat().st_mtime < _SRC.stat().st_mtime
        )
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(str(_LIB))
            except OSError:
                return None
        lib.fieldcc_abi_version.restype = ctypes.c_int
        if lib.fieldcc_abi_version() != _ABI_VERSION:
            # stale binary from an older source revision: rebuild once
            if not _build():
                return None
            lib = ctypes.CDLL(str(_LIB))
            if lib.fieldcc_abi_version() != _ABI_VERSION:
                return None
        _configure(lib)
        _lib = lib
    return _lib


def _configure(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    sz = ctypes.c_size_t
    lib.fr_limbs16_to_scalars.argtypes = [u32p, sz, ctypes.c_int, u8p]
    lib.fr_scalars_to_limbs16.argtypes = [u8p, sz, ctypes.c_int, u32p]
    lib.fr_batch_inv.argtypes = [u8p, sz]
    lib.fr_mul_batch.argtypes = [u8p, u8p, sz, u8p]
    lib.g1_msm.argtypes = [u8p, u8p, sz, u8p]
    lib.g1_fixed_base_muls.argtypes = [u8p, u8p, sz, u8p]
    lib.g1_scalar_mul.argtypes = [u8p, u8p, u8p]
    lib.g1_add_batch.argtypes = [u8p, u8p, sz, u8p]
    lib.keccak256.argtypes = [u8p, sz, u8p]
    lib.keccak256_batch.argtypes = [u8p, u64p, sz, u8p]
    lib.poseidon_init.argtypes = [u8p, u8p]
    lib.poseidon_hash_batch.argtypes = [u8p, sz, sz, u8p]
    lib.poseidon_hash_batch.restype = ctypes.c_int


def available() -> bool:
    return get() is not None


# ---------------------------------------------------------------------------
# numpy-facing helpers
# ---------------------------------------------------------------------------

def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def scalars_to_bytes(values, out: np.ndarray | None = None) -> np.ndarray:
    """List of ints (canonical, already reduced) → (n, 32) uint8 LE array."""
    n = len(values)
    if out is None:
        out = np.empty((n, 32), dtype=np.uint8)
    buf = b"".join(v.to_bytes(32, "little") for v in values)
    out[:] = np.frombuffer(buf, dtype=np.uint8).reshape(n, 32)
    return out


def bytes_to_scalars(arr: np.ndarray) -> list[int]:
    """(n, 32) uint8 LE array → list of ints."""
    data = arr.tobytes()
    return [
        int.from_bytes(data[i * 32 : (i + 1) * 32], "little")
        for i in range(arr.shape[0])
    ]


def limbs16_to_ints(limbs: np.ndarray, from_mont: bool = False) -> list[int]:
    """(16, n) uint32 device limb tensor → canonical ints (mod Fr)."""
    lib = get()
    assert lib is not None
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = limbs.shape[1]
    out = np.empty((n, 32), dtype=np.uint8)
    lib.fr_limbs16_to_scalars(_u32ptr(limbs), n, 1 if from_mont else 0, _u8ptr(out))
    return bytes_to_scalars(out)


def ints_to_limbs16(values, to_mont: bool = False) -> np.ndarray:
    """Canonical ints → (16, n) uint32 device limb tensor (optionally ×R)."""
    lib = get()
    assert lib is not None
    n = len(values)
    inp = scalars_to_bytes(values)
    out = np.empty((16, n), dtype=np.uint32)
    lib.fr_scalars_to_limbs16(_u8ptr(inp), n, 1 if to_mont else 0, _u32ptr(out))
    return out


def batch_inv(values: list[int]) -> list[int]:
    lib = get()
    assert lib is not None
    buf = scalars_to_bytes(values)
    lib.fr_batch_inv(_u8ptr(buf), len(values))
    return bytes_to_scalars(buf)


# -- curve ------------------------------------------------------------------

def points_to_bytes(points) -> np.ndarray:
    """[(x, y) | None] affine ints → (n, 64) uint8. None = infinity."""
    n = len(points)
    out = np.zeros((n, 64), dtype=np.uint8)
    chunks = []
    for p in points:
        if p is None:
            chunks.append(b"\x00" * 64)
        else:
            chunks.append(p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little"))
    out[:] = np.frombuffer(b"".join(chunks), dtype=np.uint8).reshape(n, 64)
    return out


def bytes_to_point(buf: np.ndarray):
    data = buf.tobytes()
    x = int.from_bytes(data[:32], "little")
    y = int.from_bytes(data[32:64], "little")
    if x == 0 and y == 0:
        return None
    return (x, y)


def g1_msm(points, scalars) -> tuple[int, int] | None:
    """Pippenger MSM over affine int points and int scalars → affine point."""
    lib = get()
    assert lib is not None
    pts = points_to_bytes(points)
    scs = scalars_to_bytes(scalars)
    out = np.empty(64, dtype=np.uint8)
    lib.g1_msm(_u8ptr(pts), _u8ptr(scs), len(points), _u8ptr(out))
    return bytes_to_point(out)


def g1_msm_bytes(pts: np.ndarray, scs: np.ndarray):
    """MSM over preconverted (n,64)/(n,32) uint8 arrays (no Python loop)."""
    lib = get()
    assert lib is not None
    out = np.empty(64, dtype=np.uint8)
    lib.g1_msm(_u8ptr(pts), _u8ptr(scs), pts.shape[0], _u8ptr(out))
    return bytes_to_point(out)


def g1_fixed_base_muls(base: tuple[int, int], scalars) -> list:
    """[s·base for s in scalars] (SRS generation hot loop)."""
    lib = get()
    assert lib is not None
    b = points_to_bytes([base])
    scs = scalars_to_bytes(scalars)
    out = np.empty((len(scalars), 64), dtype=np.uint8)
    lib.g1_fixed_base_muls(_u8ptr(b), _u8ptr(scs), len(scalars), _u8ptr(out))
    return [bytes_to_point(out[i]) for i in range(len(scalars))]


# -- hashes -----------------------------------------------------------------

def keccak256(data: bytes) -> bytes:
    lib = get()
    assert lib is not None
    inp = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, np.uint8)
    out = np.empty(32, dtype=np.uint8)
    lib.keccak256(_u8ptr(inp), len(data), _u8ptr(out))
    return out.tobytes()


def keccak256_batch(messages: list[bytes]) -> list[bytes]:
    lib = get()
    assert lib is not None
    data = b"".join(messages)
    offsets = np.zeros(len(messages) + 1, dtype=np.uint64)
    np.cumsum([len(m) for m in messages], out=offsets[1:])
    buf = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, np.uint8)
    out = np.empty((len(messages), 32), dtype=np.uint8)
    lib.keccak256_batch(_u8ptr(buf), _u64ptr(offsets), len(messages), _u8ptr(out))
    return [out[i].tobytes() for i in range(len(messages))]


_poseidon_ready = False


def _poseidon_setup(lib) -> None:
    global _poseidon_ready
    if _poseidon_ready:
        return
    from ..ops import poseidon as PS

    rc = scalars_to_bytes([c for row in PS.ROUND_CONSTANTS for c in row])
    mds = scalars_to_bytes([c for row in PS.MDS for c in row])
    lib.poseidon_init(_u8ptr(rc), _u8ptr(mds))
    _poseidon_ready = True


def poseidon_hash_batch(msgs: np.ndarray, L: int) -> list[int]:
    """(n, L) int-array-like of canonical scalars → n Poseidon digests."""
    lib = get()
    assert lib is not None
    _poseidon_setup(lib)
    n = len(msgs)
    flat = [int(v) for row in msgs for v in row]
    inp = scalars_to_bytes(flat)
    out = np.empty((n, 32), dtype=np.uint8)
    rc = lib.poseidon_hash_batch(_u8ptr(inp), n, L, _u8ptr(out))
    assert rc == 0
    return bytes_to_scalars(out)

"""Experiment: measure Mosaic costs for the MXU-assisted Poseidon design.

Variants timed as N dependent iterations of a small pallas kernel so the
per-iteration cost is the loop body (state stays in vregs):

  vpu_mul     — one v2-style Montgomery mul per iteration (baseline).
  boundary    — byte-split + stack/reshape + (36,R)x(R,B) bf16 dot +
                unstack + combine (the MXU reduce step, no VPU product).
  mxu_mul     — VPU product columns + MXU fold-reduction (candidate
                replacement for mont_mul).
  bcast       — sublane-broadcast probe (matrix-layout alternative).

Run ON TPU (needs the axon tunnel free):
  python scripts/exp_poseidon_mxu.py [variant ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import poseidon_fast as PF
from circuits_halo2_tpu.ops import poseidon_pallas2 as P2

P = F.FR_MOD
NL = P2.NL          # 18
LOW = PF.LOW        # 17
MASK = PF.MASK
LB = PF.LIMB_BITS   # 15

SUB = int(os.environ.get("EXP_SUB", "8"))
LANE = 128
ITERS = int(os.environ.get("EXP_ITERS", "256"))
TILES = int(os.environ.get("EXP_TILES", "64"))

_INTERPRET = not any(d.platform in ("tpu", "axon") for d in jax.devices())


def _limbs_of(x: int, n: int) -> list[int]:
    return [(x >> (LB * i)) & MASK for i in range(n)]


# ---- reduction weight matrix: byte-planes of product columns -> limbs ----
# input rows: (col k, byte h): weight 2^{15k + 8h}, k = 0..NCOLS-1, h = 0..2
# output rows: lo/hi byte planes of radix-15 digits of (weight mod p), 18 digits
NCOLS = 2 * NL  # _mul_dyn returns len(a)+len(b) columns


def _reduce_w() -> np.ndarray:
    rows = []
    for k in range(NCOLS):
        for h in range(3):
            w = pow(2, 15 * k + 8 * h, P)
            digs = _limbs_of(w, NL)
            lo = [d & 0xFF for d in digs]
            hi = [d >> 8 for d in digs]
            rows.append(lo + hi)
    return np.array(rows, dtype=np.float32).T  # (36, 3*NCOLS)


_RW = _reduce_w()
R_IN = _RW.shape[1]


def _split3_cast(cols):
    """u32 cols (< 2^24) -> 3 bf16 byte planes each."""
    def bf16(v):  # Mosaic has no u32->bf16; hop via i32->f32
        return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    planes = []
    for c in cols:
        planes.append(bf16(c & 0xFF))
        planes.append(bf16((c >> 8) & 0xFF))
        planes.append(bf16(c >> 16))
    return planes


def _mxu_reduce(w, cols, stack_mode: str):
    """Fold product columns mod p via one bf16 matmul. Returns 18 limbs."""
    planes = _split3_cast(cols)  # R_IN arrays of (SUB, LANE)
    if stack_mode == "reshape":
        d = jnp.stack(planes, axis=0).reshape(R_IN, SUB * LANE)
        out = jax.lax.dot_general(
            w, d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (36, SUB*LANE)
        out = out.reshape(36, SUB, LANE)
    elif stack_mode == "free":
        d = jnp.stack(planes, axis=0)  # (R_IN, SUB, LANE)
        out = jax.lax.dot_general(
            w, d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (36, SUB, LANE)
    else:  # batched
        d = jnp.stack(planes, axis=1)  # (SUB, R_IN, LANE)
        wb = jnp.broadcast_to(w[None], (SUB, 36, R_IN))
        out = jax.lax.dot_general(
            wb, d, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (SUB, 36, LANE)
        out = jnp.swapaxes(out, 0, 1)
    lo = out[:NL].astype(jnp.int32).astype(jnp.uint32)
    hi = out[NL:].astype(jnp.int32).astype(jnp.uint32)
    limbs = [lo[i] + (hi[i] << 8) for i in range(NL)]  # < 2^31
    return P2._fold(P2._fold(limbs))[:NL]


def _kern_vpu_mul(w_ref, x_ref, y_ref, o_ref):
    x = [x_ref[i] for i in range(NL)]
    y = [y_ref[i] for i in range(NL)]

    def body(_, xy):
        x, y = xy
        return (P2._mont_mul(x, y), x)

    x, y = jax.lax.fori_loop(0, ITERS, body, (x, y))
    for i in range(NL):
        o_ref[i] = x[i] + y[i]


def _make_kern_mxu_mul(stack_mode):
    def kern(w_ref, x_ref, y_ref, o_ref):
        w = w_ref[...]
        x = [x_ref[i] for i in range(NL)]
        y = [y_ref[i] for i in range(NL)]

        def body(_, xy):
            x, y = xy
            cols = P2._mul_dyn(x, y)  # NCOLS u32 columns
            return (_mxu_reduce(w, cols, stack_mode), x)

        x, y = jax.lax.fori_loop(0, ITERS, body, (x, y))
        for i in range(NL):
            o_ref[i] = x[i] + y[i]

    return kern


def _make_kern_boundary(stack_mode):
    """Boundary cost only: skip the VPU product, feed x-limbs widened."""
    def kern(w_ref, x_ref, y_ref, o_ref):
        w = w_ref[...]
        x = [x_ref[i] for i in range(NL)]
        cols = x + x  # fake NCOLS columns, values < 2^16

        def body(_, carry):
            cols = carry
            limbs = _mxu_reduce(w, cols, stack_mode)
            return limbs + limbs

        cols = jax.lax.fori_loop(0, ITERS, body, cols)
        for i in range(NL):
            o_ref[i] = cols[i]

    return kern


def _kern_bcast(w_ref, x_ref, y_ref, o_ref):
    """Matrix-layout probe: per-iteration sublane broadcast + mult."""
    x = x_ref[...].astype(jnp.uint32)  # (NL*? , LANE) — use full ref

    def body(j, acc):
        b = jax.lax.dynamic_slice_in_dim(acc, j % NL, 1, axis=0)  # (1, ...)
        return acc + acc * jnp.broadcast_to(b, acc.shape)

    x = jax.lax.fori_loop(0, ITERS, body, x)
    o_ref[...] = x


def run(name, kern, iters=None, n_in=NL):
    global ITERS
    if iters is not None:
        ITERS = iters
    m = TILES * SUB
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << LB, size=(NL, m, LANE), dtype=np.uint32)
    y = rng.integers(0, 1 << LB, size=(NL, m, LANE), dtype=np.uint32)
    grid = (m // SUB,)
    wmat = jnp.asarray(_RW).astype(jnp.bfloat16)
    fn = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((36, R_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NL, m, LANE), jnp.uint32),
        interpret=_INTERPRET,
    )
    fn = jax.jit(fn)
    xd, yd = jax.device_put(jnp.asarray(x)), jax.device_put(jnp.asarray(y))
    wd = jax.device_put(wmat)
    t0 = time.perf_counter()
    out = fn(wd, xd, yd).block_until_ready()
    compile_s = time.perf_counter() - t0
    reps = int(os.environ.get("EXP_REPS", "4"))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(fn(wd, xd, yd))  # materialize: tunnel-safe fence
    dt = (time.perf_counter() - t0) / reps
    per_op_ns = dt / (ITERS * m * LANE) * 1e9
    print(
        f"{name:12s} compile {compile_s:7.1f}s  warm {dt*1e3:8.2f}ms  "
        f"{per_op_ns:8.3f} ns/elem-op  ({1/per_op_ns:6.2f} Gop/s)",
        flush=True,
    )
    return dt


def _check_mxu_mul_exact():
    """Bit-exactness probe of one mxu mul vs host (interpret or device)."""
    rng = np.random.default_rng(1)
    xs = [int.from_bytes(rng.bytes(31), "little") for _ in range(4)]
    ys = [int.from_bytes(rng.bytes(31), "little") for _ in range(4)]
    m = SUB
    x = np.zeros((NL, m, LANE), dtype=np.uint32)
    y = np.zeros((NL, m, LANE), dtype=np.uint32)
    for j, (a, b) in enumerate(zip(xs, ys)):
        x[:, 0, j] = PF.int_to_limbs15(a)
        y[:, 0, j] = PF.int_to_limbs15(b)

    def kern(w_ref, x_ref, y_ref, o_ref):
        xl = [x_ref[i] for i in range(NL)]
        yl = [y_ref[i] for i in range(NL)]
        out = _mxu_reduce(w_ref[...], P2._mul_dyn(xl, yl), "free")
        for i in range(NL):
            o_ref[i] = out[i]

    fn = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((36, R_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (NL, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NL, m, LANE), jnp.uint32),
        interpret=_INTERPRET,
    )
    wmat = jnp.asarray(_RW).astype(jnp.bfloat16)
    out = np.asarray(fn(wmat, jnp.asarray(x), jnp.asarray(y)))
    for j, (a, b) in enumerate(zip(xs, ys)):
        got = 0
        for i in range(NL):
            got += int(out[i, 0, j]) << (LB * i)
        assert got % P == (a * b) % P, f"mxu mul mismatch at {j}"
    print("mxu_mul exactness: OK", flush=True)


def _kern_for(v):
    if v == "vpu_mul":
        return _kern_vpu_mul
    if v.startswith("boundary"):
        return _make_kern_boundary(v.split("_", 1)[1] if "_" in v else "free")
    if v.startswith("mxu"):
        return _make_kern_mxu_mul(v.split("_", 1)[1] if "_" in v else "free")
    if v == "bcast":
        return _kern_bcast
    raise SystemExit(f"unknown variant {v}")


if __name__ == "__main__":
    variants = sys.argv[1:] or ["check", "vpu_mul", "boundary_free", "mxu_free"]
    for v in variants:
        if v == "check":
            _check_mxu_mul_exact()
            continue
        # dual-ITERS difference: per-iteration cost with the fixed
        # dispatch + tunnel-transfer overhead cancelled out
        lo, hi = 64, 320
        dt_lo = run(f"{v}@{lo}", _kern_for(v), iters=lo)
        dt_hi = run(f"{v}@{hi}", _kern_for(v), iters=hi)
        per_mul_ns = (dt_hi - dt_lo) / (hi - lo) / (TILES * SUB * LANE) * 1e9
        print(f"{v:14s} per-elem-iter {per_mul_ns:8.3f} ns  "
              f"({1e3/per_mul_ns if per_mul_ns > 0 else 0:8.1f} M/s/elem-lane)",
              flush=True)

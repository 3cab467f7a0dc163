"""MSM stage-by-stage device profile (VERDICT r3 #3: the 2^13 Pippenger is
~45x off roofline — find out where the 1.058s goes).

Splits `_pippenger_core` into separately-jitted stages and times each on
the device: (a) argsort+gather, (b) two-level segmented bucket sums,
(c) bucket-table build + suffix/tree window reduction, (d) the serial
window Horner, (e) the full kernel. Timings are min-of-3 after a warm-up
call; each stage's output is partially materialized to force completion
(block_until_ready does NOT fence the axon tunnel — PROGRESS.md).

Run: python scripts/exp_msm_profile.py [log2_n] [batch]
"""

import functools
import os
import random
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from circuits_halo2_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from circuits_halo2_tpu.ops import curve as C  # noqa: E402
from circuits_halo2_tpu.ops import field as F  # noqa: E402
from circuits_halo2_tpu.ops import msm as M  # noqa: E402


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile + warm
    _materialize(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _materialize(out):
    if isinstance(out, tuple):
        for o in out:
            _materialize(o)
    else:
        np.asarray(out)


@functools.partial(jax.jit, static_argnames=("n",))
def stage_sort(xs, ys, valid, digits, n):
    perm = jnp.argsort(digits, axis=-1)
    seg = jnp.take_along_axis(digits, perm, axis=-1)
    px = jnp.take(xs, perm, axis=1)
    py = jnp.take(ys, perm, axis=1)
    pv = valid[perm]
    return px, py, pv, seg


@functools.partial(jax.jit, static_argnames=("n",))
def stage_argsort_only(digits, n):
    return jnp.argsort(digits, axis=-1)


@functools.partial(jax.jit, static_argnames=("n",))
def stage_seg(px, py, pv, seg, n):
    local, carry, carry_seg, _ = M._segmented_sum_parts(px, py, pv, seg)
    return local[0][..., ::64], carry[0]


@functools.partial(jax.jit, static_argnames=("n",))
def stage_to_windows(px, py, pv, seg, n):
    """Everything from sorted points to per-window sums (no Horner)."""
    nmsm = seg.shape[0]
    local, carry, carry_seg, L = M._segmented_sum_parts(px, py, pv, seg)
    ends = jnp.concatenate(
        [seg[..., 1:] != seg[..., :-1], jnp.ones(seg.shape[:-1] + (1,), bool)],
        axis=-1,
    )
    write_col = jnp.where(ends, seg, 256)
    pos_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), seg.shape)
    table = jnp.full((nmsm, M.NWIN, 257), n, dtype=jnp.int32)
    b_ix = jnp.broadcast_to(jnp.arange(nmsm)[:, None, None], seg.shape)
    w_ix = jnp.broadcast_to(jnp.arange(M.NWIN)[None, :, None], seg.shape)
    table = table.at[b_ix, w_ix, write_col].set(pos_idx)
    bucket_pos = table[..., :256]
    gather = jnp.clip(bucket_pos, 0, n - 1)[None]
    gidx = jnp.broadcast_to(gather, (16,) + bucket_pos.shape)
    bx = jnp.take_along_axis(local[0], gidx, axis=-1)
    by = jnp.take_along_axis(local[1], gidx, axis=-1)
    bz = jnp.take_along_axis(local[2], gidx, axis=-1)
    live = (bucket_pos < n) & (jnp.arange(256) > 0)
    bz = jnp.where(live[None], bz, jnp.zeros_like(bz))
    chunk_ix = jnp.clip(bucket_pos // L, 0, carry_seg.shape[-1] - 1)
    cs_g = jnp.take_along_axis(carry_seg, chunk_ix, axis=-1)
    cidx = jnp.broadcast_to(chunk_ix[None], (16,) + chunk_ix.shape)
    cx = jnp.take_along_axis(carry[0], cidx, axis=-1)
    cy = jnp.take_along_axis(carry[1], cidx, axis=-1)
    cz = jnp.take_along_axis(carry[2], cidx, axis=-1)
    apply = live & (cs_g == jnp.arange(256))
    cz = jnp.where(apply[None], cz, jnp.zeros_like(cz))
    bx, by, bz = M.jac_add((bx, by, bz), (cx, cy, cz))
    suf = M._suffix_sum_scan((bx, by, bz))
    keep = jnp.arange(256) > 0
    suf = (suf[0], suf[1], jnp.where(keep[None, None, None], suf[2], 0))
    win = M._tree_sum_last(suf)
    return tuple(c[..., 0] for c in win)


@functools.partial(jax.jit, static_argnames=("nmsm",))
def stage_horner(win, nmsm):
    def step(acc, s_w):
        acc = jax.lax.fori_loop(0, M.WINDOW, lambda _, a: M.jac_double(a), acc)
        return M.jac_add(acc, s_w), None

    ws = tuple(jnp.moveaxis(c, 2, 0)[::-1] for c in win)
    zero = tuple(jnp.zeros((16, nmsm), jnp.uint32) for _ in range(3))
    acc, _ = jax.lax.scan(step, zero, ws)
    return acc


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log2n
    rng = random.Random(7)
    base = [C.g1_mul(C.G1_GEN, rng.randrange(1, F.FR_MOD)) for _ in range(64)]
    points = [base[i % 64] for i in range(n)]
    rows = [[rng.randrange(F.FR_MOD) for _ in range(n)] for _ in range(nb)]

    t0 = time.perf_counter()
    xs, ys, valid = M.precompute_bases(points)
    digits_np = M._scalars_to_digits(rows, n)
    t_prep = time.perf_counter() - t0
    digits = jnp.asarray(digits_np)

    report = {"n": n, "batch": nb, "host_prep_s": round(t_prep, 4)}

    t = timeit(M._pippenger_device, xs, ys, valid, digits, n, nb)
    report["full_s"] = round(t, 4)
    report["full_pts_per_s"] = round(n * nb / t, 1)

    t = timeit(stage_argsort_only, digits, n)
    report["argsort_s"] = round(t, 4)

    px, py, pv, seg = stage_sort(xs, ys, valid, digits, n)
    t = timeit(stage_sort, xs, ys, valid, digits, n)
    report["sort_gather_s"] = round(t, 4)

    t = timeit(stage_seg, px, py, pv, seg, n)
    report["segscan_s"] = round(t, 4)

    win = stage_to_windows(px, py, pv, seg, n)
    t = timeit(stage_to_windows, px, py, pv, seg, n)
    report["to_windows_s"] = round(t, 4)

    t = timeit(stage_horner, win, nb)
    report["horner_s"] = round(t, 4)

    import json

    print(json.dumps(report))


if __name__ == "__main__":
    main()

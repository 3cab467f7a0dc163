"""Multi-scalar multiplication on device — batched Jacobian EC arithmetic.

Replaces ``halo2_proofs::arithmetic::best_multiexp`` (Pippenger on rayon
threads; SURVEY.md §2b). Round-1 device algorithm is a vectorized bit-slice
double-and-add:

    acc = 0
    for bit b from MSB to LSB:
        acc = 2·acc + Σ_i { P_i : scalar_i has bit b }

The inner Σ is a log-depth pairwise tree of Jacobian adds over the full
lane-width — every step is a wide VPU op, there is no data-dependent control
flow, and the scan over bits keeps the compiled graph small. (The Pippenger
bucket variant with sorted segments + sharded windows is the planned
upgrade; the MSM API here is the stable seam.)

Points: Jacobian (X, Y, Z) over Fq, each coordinate a (16, N) Montgomery
limb tensor; Z = 0 encodes infinity.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from . import field_jax as FJ

FQ = FJ.FQ

SCALAR_BITS = 254


def _mm(a, b):
    return FJ.mont_mul(a, b, FQ)


def _add(a, b):
    return FJ.add_mod(a, b, FQ)


def _sub(a, b):
    return FJ.sub_mod(a, b, FQ)


def _dbl_f(a):  # 2a
    return FJ.add_mod(a, a, FQ)


def jac_double(p):
    """Jacobian doubling, a=0 curve (dbl-2009-l). Handles infinity via Z=0."""
    x, y, z = p
    a = _mm(x, x)
    b = _mm(y, y)
    c = _mm(b, b)
    xb = _add(x, b)
    d = _sub(_sub(_mm(xb, xb), a), c)
    d = _dbl_f(d)
    e = _add(_add(a, a), a)
    f = _mm(e, e)
    x3 = _sub(f, _dbl_f(d))
    c8 = _dbl_f(_dbl_f(_dbl_f(c)))
    y3 = _sub(_mm(e, _sub(d, x3)), c8)
    z3 = _dbl_f(_mm(y, z))
    # doubling of infinity (z=0) yields z3=0 automatically; y=0 → z3=0 too.
    return (x3, y3, z3)


def jac_add(p, q):
    """Complete Jacobian addition (add-2007-bl) with case handling."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = _mm(z1, z1)
    z2z2 = _mm(z2, z2)
    u1 = _mm(x1, z2z2)
    u2 = _mm(x2, z1z1)
    s1 = _mm(_mm(y1, z2), z2z2)
    s2 = _mm(_mm(y2, z1), z1z1)
    h = _sub(u2, u1)
    rr = _dbl_f(_sub(s2, s1))
    i = _mm(_dbl_f(h), _dbl_f(h))
    j = _mm(h, i)
    v = _mm(u1, i)
    x3 = _sub(_sub(_mm(rr, rr), j), _dbl_f(v))
    y3 = _sub(_mm(rr, _sub(v, x3)), _dbl_f(_mm(s1, j)))
    z1z2 = _mm(z1, z2)
    z3 = _dbl_f(_mm(z1z2, h))

    p_inf = FJ.is_zero(z1)
    q_inf = FJ.is_zero(z2)
    h_zero = FJ.is_zero(h)
    r_zero = FJ.is_zero(rr)
    dbl = jac_double(p)

    sel = FJ.select
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    # h==0, r!=0 → P + (-P) = infinity
    to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf
    x3 = sel(use_dbl, dbl[0], x3)
    y3 = sel(use_dbl, dbl[1], y3)
    z3 = sel(use_dbl, dbl[2], z3)
    z3 = sel(to_inf, jnp.zeros_like(z3), z3)
    x3 = sel(p_inf, x2, sel(q_inf, x1, x3))
    y3 = sel(p_inf, y2, sel(q_inf, y1, y3))
    z3 = sel(p_inf, z2, sel(q_inf, z1, z3))
    return (x3, y3, z3)


def jac_madd(p, q):
    """Mixed addition: Jacobian p + affine q (madd-2007-bl), where q is
    (x2, y2, valid) with implicit Z2 = 1 and valid=False meaning infinity.
    ~11 field muls vs ~16 for the general add — used in the serial bucket-
    accumulation scan where every added element is an original base point."""
    x1, y1, z1 = p
    x2, y2, valid = q
    z1z1 = _mm(z1, z1)
    u2 = _mm(x2, z1z1)
    s2 = _mm(_mm(y2, z1), z1z1)
    h = _sub(u2, x1)
    hh = _mm(h, h)
    i = _dbl_f(_dbl_f(hh))
    j = _mm(h, i)
    rr = _dbl_f(_sub(s2, y1))
    v = _mm(x1, i)
    x3 = _sub(_sub(_mm(rr, rr), j), _dbl_f(v))
    y3 = _sub(_mm(rr, _sub(v, x3)), _dbl_f(_mm(y1, j)))
    z1h = _add(z1, h)
    z3 = _sub(_sub(_mm(z1h, z1h), z1z1), hh)

    p_inf = FJ.is_zero(z1)
    h_zero = FJ.is_zero(h)
    r_zero = FJ.is_zero(rr)
    q_inf = ~valid
    dbl = jac_double(p)

    one = jnp.broadcast_to(
        FJ._bc(FQ.one_mont, x2.ndim), x2.shape
    ).astype(x2.dtype)

    sel = FJ.select
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf
    x3 = sel(use_dbl, dbl[0], x3)
    y3 = sel(use_dbl, dbl[1], y3)
    z3 = sel(use_dbl, dbl[2], z3)
    z3 = sel(to_inf, jnp.zeros_like(z3), z3)
    x3 = sel(p_inf, x2, x3)
    y3 = sel(p_inf, y2, y3)
    z3 = sel(p_inf, one, z3)
    x3 = sel(q_inf, x1, x3)
    y3 = sel(q_inf, y1, y3)
    z3 = sel(q_inf, z1, z3)
    return (x3, y3, z3)


def _tree_sum(p, n: int):
    """Pairwise-tree sum of n (power-of-two) lane points → width-1 point."""
    x, y, z = p
    while n > 1:
        half = n // 2
        a = (x[:, :half], y[:, :half], z[:, :half])
        b = (x[:, half:n], y[:, half:n], z[:, half:n])
        x, y, z = jac_add(a, b)
        n = half
    return (x, y, z)


@functools.partial(jax.jit, static_argnames=("n",))
def _msm_device(xs, ys, bits, n: int):
    """xs, ys: (16, n) affine Montgomery Fq coords; bits: (SCALAR_BITS, n)
    uint32 scalar bits, MSB first. Returns width-1 Jacobian point."""
    one = jnp.broadcast_to(FJ._bc(FQ.one_mont, 2), (16, n)).astype(jnp.uint32)

    def step(acc, bit_row):
        acc = jac_double(acc)
        # select P_i when bit set: use Z = bit (0 → infinity)
        z = jnp.where(bit_row[None, :] > 0, one, jnp.zeros_like(one))
        contrib = _tree_sum((xs, ys, z), n)
        return jac_add(acc, contrib), None

    zero = (
        jnp.zeros((16, 1), jnp.uint32),
        jnp.zeros((16, 1), jnp.uint32),
        jnp.zeros((16, 1), jnp.uint32),
    )
    acc, _ = jax.lax.scan(step, zero, bits)
    return acc


def _points_to_device(points) -> tuple[np.ndarray, np.ndarray]:
    """Affine host points → Montgomery coord arrays; infinity → (0, 0)."""
    xs = [(p[0] << 256) % F.FQ_MOD if p is not None else 0 for p in points]
    ys = [(p[1] << 256) % F.FQ_MOD if p is not None else 0 for p in points]
    return FJ.ints_to_limbs(xs), FJ.ints_to_limbs(ys)


def _scalars_to_bits(scalars, n: int) -> np.ndarray:
    """Host scalars → (SCALAR_BITS, n) uint32, MSB first. Infinity/zero-pad
    lanes get zero scalars."""
    out = np.zeros((SCALAR_BITS, n), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s %= F.FR_MOD
        for b in range(SCALAR_BITS):
            out[SCALAR_BITS - 1 - b, i] = (s >> b) & 1
    return out


def jac_to_affine_host(p):
    """Width-1 device Jacobian point → host affine tuple (or None)."""
    rinv = pow(1 << 256, -1, F.FQ_MOD)
    x = FJ.limbs_to_ints(np.asarray(p[0]))[0] * rinv % F.FQ_MOD
    y = FJ.limbs_to_ints(np.asarray(p[1]))[0] * rinv % F.FQ_MOD
    z = FJ.limbs_to_ints(np.asarray(p[2]))[0] * rinv % F.FQ_MOD
    if z == 0:
        return None
    zinv = pow(z, -1, F.FQ_MOD)
    zi2 = zinv * zinv % F.FQ_MOD
    return (x * zi2 % F.FQ_MOD, y * zi2 % F.FQ_MOD * zinv % F.FQ_MOD)


# Fixed device lane width: every MSM dispatch compiles once. Large MSMs are
# chunked; chunk partials are combined host-side (a handful of adds).
CHUNK = 2048
# Below this size the host naive MSM is faster than a device dispatch.
HOST_THRESHOLD = 256


def msm(points, scalars):
    """MSM of host affine points with host int scalars → host affine point."""
    assert len(points) == len(scalars)
    # explicit infinity points must not be resurrected by Z=bit — zero their
    # scalars so their bits never select them.
    scalars = [0 if p is None else s for p, s in zip(points, scalars)]
    if len(points) < HOST_THRESHOLD:
        return C.g1_msm(points, scalars)
    acc = None
    for ofs in range(0, len(points), CHUNK):
        pts = points[ofs : ofs + CHUNK]
        scs = scalars[ofs : ofs + CHUNK]
        if len(pts) < CHUNK:
            pts = pts + [None] * (CHUNK - len(pts))
            scs = scs + [0] * (CHUNK - len(scs))
        xs, ys = _points_to_device(pts)
        bits = _scalars_to_bits(scs, CHUNK)
        part = jac_to_affine_host(
            _msm_device(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bits), CHUNK)
        )
        acc = C.g1_add(acc, part)
    return acc


# ---------------------------------------------------------------------------
# Device Pippenger (the production MSM path)
# ---------------------------------------------------------------------------
#
# TPU-shaped bucket method (`best_multiexp` equivalent, SURVEY.md §2b):
#
#   1. 8-bit windows aligned on scalar bytes → digits (B, W=32, n) int32.
#   2. Per (msm, window): argsort points by digit, gather coords — every
#      bucket's members become one contiguous segment.
#   3. Segmented inclusive scan (Hillis–Steele: log2(n) full-width Jacobian
#      adds with shifted operands) → each segment end holds its bucket sum.
#      No scatter of EC values is ever needed (Mosaic/XLA scatter-add of
#      custom semirings doesn't exist); only int32 indices are scattered.
#   4. Bucket sums pulled into a (B, W, 256) table by index scatter+gather;
#      Σ b·B_b computed as Σ_k suffix_k via a suffix scan + tree sum.
#   5. Horner fold over windows: acc = 2^8·acc + S_w (lax.scan, width B).
#
# Everything from 2-5 is one jit with static (n, B); bases are converted to
# Montgomery limb tensors once per SRS and cached (precompute_bases).

WINDOW = int(os.environ.get("CIRCUITS_MSM_WINDOW", 8))
NWIN = -(-256 // WINDOW)  # windows covering 256 bits
NBUCKET = 1 << WINDOW


def _log_steps(n: int) -> jnp.ndarray:
    """[1, 2, 4, …] covering spans up to n, as a scan input."""
    return jnp.asarray([1 << i for i in range(max(1, (n - 1).bit_length()))],
                       dtype=jnp.int32)


def _roll_scan(p, n: int, direction: int, seg=None):
    """Hillis–Steele log-depth Jacobian sum scan along the last axis.

    direction=+1: inclusive prefix scan (last lane of each segment holds the
    segment sum). direction=-1: inclusive suffix scan.

    Two layout/compile constraints shape this implementation (both paid for
    in device experiments):

    - the ``lax.scan`` over shift distances keeps exactly ONE ``jac_add``
      in the compiled graph regardless of n — a statically unrolled
      variant is a compile bomb (each traced jac_add is ~5k HLO ops; 25 of
      them wedged the remote XLA compile for >30 min);
    - the scanned axis is transposed OFF the minor (lane) dimension before
      scanning: a dynamic-shift roll on the lane axis lowers to per-lane
      rotations (the dominant cost in the 2^13 device profile), while on a
      major axis it is a contiguous block move. The batch axes collapse
      into the minor dimension, keeping the 128-wide lanes full.
    """
    batch = p[0].shape[1:-1]
    m = 1
    for s in batch:
        m *= s
    pt = tuple(
        jnp.moveaxis(c, -1, 1).reshape((16, n, m)) for c in p
    )
    st = None
    if seg is not None:
        st = jnp.moveaxis(seg, -1, 0).reshape((n, m))
    out = _roll_scan_axis1(pt, n, direction, st)
    return tuple(
        jnp.moveaxis(c.reshape((16, n) + batch), 1, -1) for c in out
    )


def _roll_scan_axis1(p, n: int, direction: int, seg=None):
    """The scan itself: p tensors (16, n, m) scanned along axis 1; seg
    (n, m) segment ids or None."""
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(carry, d):
        prev = tuple(jnp.roll(c, direction * d, axis=1) for c in carry)
        if direction > 0:
            valid = idx >= d
        else:
            valid = idx < n - d
        if seg is not None:
            vs = valid[:, None] & (jnp.roll(seg, direction * d, axis=0) == seg)
            pz = jnp.where(vs[None], prev[2], jnp.zeros_like(prev[2]))
        else:
            pz = jnp.where(valid[None, :, None], prev[2], jnp.zeros_like(prev[2]))
        return jac_add(carry, (prev[0], prev[1], pz)), None

    out, _ = jax.lax.scan(body, p, _log_steps(n))
    return out


def _seg_chunk_len(n: int) -> int:
    """Serial chunk length for the two-level segmented scan.

    Smaller L = fewer serial steps but wider lanes per step AND a longer
    chunk-total carry scan; device sweep at 2^13×4 (exp_msm_profile with
    CIRCUITS_MSM_SEG_L) picked the default. Overridable for experiments."""
    env = os.environ.get("CIRCUITS_MSM_SEG_L")
    if env:
        return max(4, min(int(env), n // 4))
    # Longer chunks = fewer chunk totals = a shallower cross-chunk carry
    # scan (log2(nchunk) XLA jac_adds — the fixed-cost tail). With the
    # pallas scan kernel the serial chunk length is nearly free (device
    # sweep round 5: 2^15x4 went 215k → 273k pts/s moving L 64 → 512;
    # 2^17x4 flat between L=256 and 512), so cap nchunk low.
    return max(16, min(512, n // 64))


def _segmented_sum_parts(px, py, pvalid, seg):
    """Two-level segmented bucket accumulation over sorted affine points.

    px, py: (16, …, n) affine Montgomery coords (sorted by digit);
    pvalid: (…, n) bool (False = point at infinity); seg: (…, n) sorted
    int32 digits. Returns ``(local, carry, carry_seg, L)`` where

    - ``local``  ((16,…,n),)×3 Jacobian: the *chunk-local* inclusive
      segmented sums (chunks of length L),
    - ``carry``  ((16,…,n/L),)×3: for each chunk, the Jacobian sum carried
      into it by its leading segment when that segment spans chunks,
    - ``carry_seg`` (…, n/L): the segment id the carry belongs to.

    The caller folds ``carry`` in only where it needs exact values (the
    per-bucket segment ends) — O(buckets) instead of O(n) extra adds.
    Phase 1 is a serial ``lax.scan`` of mixed (Jacobian+affine) adds: O(n)
    lane-work total, log-free; phase 2 is a log-depth scan over the n/L
    chunk totals. (The naive Hillis–Steele costs O(n·log n) full adds.)
    """
    n = seg.shape[-1]
    L = _seg_chunk_len(n)
    assert L >= 4, "point count too small for the chunked scan"
    nchunk = n // L

    shp = px.shape[:-1] + (nchunk, L)
    xs = px.reshape(shp)
    ys = py.reshape(shp)
    vs = pvalid.reshape(pvalid.shape[:-1] + (nchunk, L))
    segc = seg.reshape(seg.shape[:-1] + (nchunk, L))
    xs_t = jnp.moveaxis(xs, -1, 0)                         # (L,16,…,nchunk)
    ys_t = jnp.moveaxis(ys, -1, 0)
    vs_t = jnp.moveaxis(vs, -1, 0)                         # (L,…,nchunk)
    seg_t = jnp.moveaxis(segc, -1, 0)

    def body(carry, inp):
        cx, cy, cz, cseg = carry
        ex, ey, ev, eseg = inp
        cz = jnp.where((eseg == cseg)[None], cz, jnp.zeros_like(cz))
        nx, ny, nz = jac_madd((cx, cy, cz), (ex, ey, ev))
        return (nx, ny, nz, eseg), (nx, ny, nz)

    zero = jnp.zeros_like(xs_t[0])
    init = (zero, zero, zero, jnp.full_like(seg_t[0], -1))
    _, out = jax.lax.scan(body, init, (xs_t, ys_t, vs_t, seg_t))
    local = tuple(jnp.moveaxis(y, 0, -1) for y in out)     # (16,…,nchunk,L)

    # cross-chunk carry: exclusive segmented scan over chunk totals
    last_vals = tuple(c[..., -1] for c in local)           # (16,…,nchunk)
    last_seg = segc[..., -1]                               # (…,nchunk)
    inc = _roll_scan(last_vals, nchunk, +1, seg=last_seg)
    carry = tuple(jnp.roll(c, 1, axis=-1) for c in inc)
    carry_seg = jnp.where(
        jnp.arange(nchunk) > 0, jnp.roll(last_seg, 1, axis=-1), -1
    )
    local = tuple(c.reshape(px.shape) for c in local)
    return local, carry, carry_seg, L


def _segmented_sum_parts_pallas(px, py, pvalid, seg, interpret: bool = False):
    """Fused-kernel variant of `_segmented_sum_parts`: identical outputs,
    but the L-step serial scan of jac_madds runs inside ONE pallas kernel
    with the Jacobian accumulator resident in VMEM (ops/msm_pallas) —
    no HBM round-trips or per-step dispatches. The 16-limb R256-Montgomery
    tensors are bridged to the kernel's 15-limb R15 form by one field mul
    per element on each side."""
    from . import msm_pallas as MP

    n = seg.shape[-1]
    L = _seg_chunk_len(n)
    nchunk = n // L
    batch = seg.shape[:-1]
    flat = int(np.prod(batch)) * nchunk if batch else nchunk

    def to_lanes(a16):
        # (16, ..., nchunk, L) → (L, ntile, 16, 8, 128); domain stays
        # R256-Montgomery — the kernel converts per loaded point
        a = a16.reshape((16,) + batch + (nchunk, L))
        a = jnp.moveaxis(a, 0, -1)                    # (..., nchunk, L, 16)
        a = a.reshape(flat, L, 16)
        pad = (-flat) % MP.TILE
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, L, 16), jnp.uint32)], axis=0
            )
        ntile = (flat + pad) // MP.TILE
        a = a.reshape(ntile, MP.SUB_LANE, MP.LANE, L, 16)
        return jnp.transpose(a, (3, 0, 4, 1, 2))      # (L, ntile, 16, 8, 128)

    def to_lanes_scalar(s):
        a = s.reshape(batch + (nchunk, L)).reshape(flat, L)
        pad = (-flat) % MP.TILE
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, L), s.dtype)], axis=0)
        ntile = (flat + pad) // MP.TILE
        a = a.reshape(ntile, MP.SUB_LANE, MP.LANE, L)
        return jnp.transpose(a, (3, 0, 1, 2))         # (L, ntile, 8, 128)

    seg_l = to_lanes_scalar(seg.astype(jnp.uint32))
    vs_l = to_lanes_scalar(pvalid.astype(jnp.uint32))
    xs_l = to_lanes(px)
    ys_l = to_lanes(py)

    ox, oy, oz = MP._scan_pallas(seg_l, xs_l, ys_l, vs_l, interpret=interpret)

    def from_lanes(o):
        # (L, ntile, 16, 8, 128) → (16, ..., nchunk, L) — pure transpose,
        # values already canonical 16-limb R256-Montgomery
        ntile = o.shape[1]
        a = jnp.transpose(o, (1, 3, 4, 0, 2))        # (ntile, 8, 128, L, 16)
        a = a.reshape(ntile * MP.TILE, L, 16)[:flat]
        a = jnp.moveaxis(a, -1, 0)                   # (16, flat, L)
        return a.reshape((16,) + batch + (nchunk, L))

    local5 = tuple(from_lanes(o) for o in (ox, oy, oz))

    # cross-chunk carry (unchanged from the XLA path)
    last_vals = tuple(c[..., -1] for c in local5)
    segc = seg.reshape(seg.shape[:-1] + (nchunk, L))
    last_seg = segc[..., -1]
    inc = _roll_scan(last_vals, nchunk, +1, seg=last_seg)
    carry = tuple(jnp.roll(c, 1, axis=-1) for c in inc)
    carry_seg = jnp.where(
        jnp.arange(nchunk) > 0, jnp.roll(last_seg, 1, axis=-1), -1
    )
    local = tuple(c.reshape(px.shape) for c in local5)
    return local, carry, carry_seg, L


def _suffix_sum_scan(p):
    """Inclusive suffix sums along the last axis (length must be 2^k)."""
    return _roll_scan(p, p[0].shape[-1], -1)


def _tree_sum_last(p):
    """Jacobian sum along the (power-of-two) last axis → size 1."""
    total = _roll_scan(p, p[0].shape[-1], +1)
    return tuple(c[..., -1:] for c in total)


def _use_pallas_scan() -> bool:
    """Fused pallas bucket scan (ops/msm_pallas) — default on TPU-family
    backends, off on CPU (no Mosaic; interpret mode is test-only)."""
    mode = os.environ.get("CIRCUITS_MSM_PALLAS", "auto")
    if mode in ("0", "off"):
        return False
    if mode in ("1", "on"):
        return True
    try:
        import jax as _jax

        return _jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _pippenger_windows(xs, ys, valid, digits):
    """Shape-polymorphic Pippenger bucket stage: everything up to (and
    including) the per-window sums, which is all the wide data-parallel
    work. Returns a (16, nmsm, NWIN) Jacobian triple of window sums S_w.

    xs, ys: (16, n) affine Montgomery Fq coords; valid: (n,) bool (False =
    point at infinity); digits: (nmsm, NWIN, n) int32 byte digits (LE window
    order)."""
    n = xs.shape[1]
    nmsm = digits.shape[0]

    perm = jnp.argsort(digits, axis=-1)  # (B, W, n)
    seg = jnp.take_along_axis(digits, perm, axis=-1)
    # one fused gather for both coordinates (halves gather-op count)
    pxy = jnp.take(jnp.concatenate([xs, ys], axis=0), perm, axis=1)
    px, py = pxy[:16], pxy[16:]      # (16, B, W, n) each
    pv = valid[perm]                 # (B, W, n)

    if _use_pallas_scan():
        local, carry, carry_seg, L = _segmented_sum_parts_pallas(
            px, py, pv, seg
        )
    else:
        local, carry, carry_seg, L = _segmented_sum_parts(px, py, pv, seg)

    # segment ends → bucket index table (B, W, NBUCKET+1); the last
    # column is a trash lane for non-end positions, sentinel n = empty.
    ends = jnp.concatenate(
        [seg[..., 1:] != seg[..., :-1], jnp.ones(seg.shape[:-1] + (1,), bool)],
        axis=-1,
    )
    write_col = jnp.where(ends, seg, NBUCKET)
    pos_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), seg.shape)
    table = jnp.full((nmsm, NWIN, NBUCKET + 1), n, dtype=jnp.int32)
    b_ix = jnp.broadcast_to(jnp.arange(nmsm)[:, None, None], seg.shape)
    w_ix = jnp.broadcast_to(jnp.arange(NWIN)[None, :, None], seg.shape)
    table = table.at[b_ix, w_ix, write_col].set(pos_idx)
    bucket_pos = table[..., :NBUCKET]  # (B, W, NBUCKET)

    gather = jnp.clip(bucket_pos, 0, n - 1)[None]  # (1, B, W, 256)
    gidx = jnp.broadcast_to(gather, (16,) + bucket_pos.shape)
    bx = jnp.take_along_axis(local[0], gidx, axis=-1)
    by = jnp.take_along_axis(local[1], gidx, axis=-1)
    bz = jnp.take_along_axis(local[2], gidx, axis=-1)
    live = (bucket_pos < n) & (jnp.arange(NBUCKET) > 0)  # drop empty + bucket 0
    bz = jnp.where(live[None], bz, jnp.zeros_like(bz))

    # fold the cross-chunk carries in at the bucket ends only (O(buckets)
    # adds): bucket b's end in chunk c needs carry[c] iff its segment spans
    # into c, i.e. carry_seg[c] == b.
    chunk_ix = jnp.clip(bucket_pos // L, 0, carry_seg.shape[-1] - 1)
    cs_g = jnp.take_along_axis(carry_seg, chunk_ix, axis=-1)  # (B, W, 256)
    cidx = jnp.broadcast_to(chunk_ix[None], (16,) + chunk_ix.shape)
    cx = jnp.take_along_axis(carry[0], cidx, axis=-1)
    cy = jnp.take_along_axis(carry[1], cidx, axis=-1)
    cz = jnp.take_along_axis(carry[2], cidx, axis=-1)
    apply = live & (cs_g == jnp.arange(NBUCKET))
    cz = jnp.where(apply[None], cz, jnp.zeros_like(cz))
    bx, by, bz = jac_add((bx, by, bz), (cx, cy, cz))

    # Σ_{b≥1} b·B_b = Σ_{k≥1} suffix_k
    suf = _suffix_sum_scan((bx, by, bz))
    keep = jnp.arange(NBUCKET) > 0
    suf = (suf[0], suf[1], jnp.where(keep[None, None, None], suf[2], 0))
    win = _tree_sum_last(suf)  # (16, B, W, 1)
    return tuple(c[..., 0] for c in win)  # (16, B, W)


def _pippenger_core(xs, ys, valid, digits):
    """Bucket stage + in-graph window Horner → (16, nmsm) Jacobian points.

    Used by the shard_map distributed path, where each shard must hand a
    single point per MSM to the all_gather fold. The single-device wrappers
    instead stop at `_pippenger_windows` and fold the 32 window sums
    host-side (`_combine_windows_host`) — the in-graph Horner is 256
    serial EC ops on (16, B)-sized tensors, pure dispatch latency."""
    nmsm = digits.shape[0]
    win = _pippenger_windows(xs, ys, valid, digits)

    # Horner over windows, MSB (window NWIN-1) first: acc = 2^8·acc + S_w
    def step(acc, s_w):
        acc = jax.lax.fori_loop(0, WINDOW, lambda _, a: jac_double(a), acc)
        return jac_add(acc, s_w), None

    ws = tuple(jnp.moveaxis(c, 2, 0)[::-1] for c in win)  # (W, 16, B)
    zero = tuple(jnp.zeros((16, nmsm), jnp.uint32) for _ in range(3))
    acc, _ = jax.lax.scan(
        lambda a, s: step(a, s), zero, ws
    )
    return acc


@functools.partial(jax.jit, static_argnames=("n", "nmsm"))
def _pippenger_device(xs, ys, valid, digits, n: int, nmsm: int):
    """Single-device jitted Pippenger bucket stage; (n, nmsm) pin the
    compiled shape. Returns (16, nmsm, NWIN) window sums — the caller
    combines windows host-side."""
    return _pippenger_windows(xs, ys, valid, digits)


def _combine_windows_host(acc) -> list:
    """(16, B, NWIN) Jacobian window sums → B host affine points (or None).

    acc_b = Σ_w 2^{8w}·S_{b,w} computed by the native host MSM over ≤32
    tiny points per row — replaces the device Horner (256 sequential
    small-tensor EC ops, the latency-bound tail of the device Pippenger;
    the wide bucket work stays on device)."""
    ax, ay, az = (np.asarray(c) for c in acc)
    nb, nw = ax.shape[1], ax.shape[2]
    q = F.FQ_MOD
    rinv = pow(1 << 256, -1, q)
    xs = [v * rinv % q for v in FJ.limbs_to_ints(ax.reshape(16, nb * nw))]
    ys = [v * rinv % q for v in FJ.limbs_to_ints(ay.reshape(16, nb * nw))]
    zs = [v * rinv % q for v in FJ.limbs_to_ints(az.reshape(16, nb * nw))]
    out = []
    for b_i in range(nb):
        pts, scal = [], []
        for w_i in range(nw):
            i = b_i * nw + w_i
            z = zs[i]
            if z == 0:
                continue
            zi = pow(z, -1, q)
            zi2 = zi * zi % q
            pts.append((xs[i] * zi2 % q, ys[i] * zi2 % q * zi % q))
            scal.append(1 << (WINDOW * w_i))
        out.append(_msm_host(pts, scal) if pts else None)
    return out


_bases_cache: dict = {}


def _pad_n(n_real: int) -> int:
    """Bucket the point count to a power of two ≥ 256 so (a) the jitted
    graph compiles for only a handful of distinct shapes (compiles are
    minutes-expensive) and (b) the two-level segmented scan always has
    chunks of length ≥ 4. Zero-padded lanes carry valid=False."""
    return max(256, 1 << (n_real - 1).bit_length())


def precompute_bases(points) -> tuple:
    """Affine host points → cached (xs, ys, valid) device-ready arrays,
    zero-padded to the bucketed lane count ``_pad_n(len(points))``.

    Keyed by the identity of the list object (SRS vectors are long-lived on
    ParamsKZG); conversion is the only per-base host bigint work.
    """
    key = (id(points), len(points))
    hit = _bases_cache.get(key)
    if hit is not None:
        return hit
    n = _pad_n(len(points))
    xs, ys = _points_to_device(points)
    if n > len(points):
        pad = np.zeros((16, n - len(points)), dtype=np.uint32)
        xs = np.concatenate([xs, pad], axis=1)
        ys = np.concatenate([ys, pad], axis=1)
    valid = np.zeros(n, dtype=bool)
    valid[: len(points)] = [p is not None for p in points]
    out = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid))
    if len(_bases_cache) > 8:
        _bases_cache.clear()
    _bases_cache[key] = out
    return out


def _scalars_to_digits(scalar_rows, n: int) -> np.ndarray:
    """(B rows of n scalars) → (B, NWIN, n) int32 window digits, LE
    windows of WINDOW bits (vectorized byte slicing, any WINDOW ≤ 16)."""
    b = len(scalar_rows)
    mask = NBUCKET - 1
    out = np.empty((b, NWIN, n), dtype=np.int32)
    for i, row in enumerate(scalar_rows):
        buf = b"".join((s % F.FR_MOD).to_bytes(33, "little") for s in row)
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(row), 33)
        if len(row) < n:
            arr = np.vstack([arr, np.zeros((n - len(row), 33), np.uint8)])
        a32 = arr.astype(np.int32)
        for w in range(NWIN):
            bit = WINDOW * w
            b0, r = divmod(bit, 8)
            d = a32[:, b0] >> r
            if b0 + 1 < 33:
                d = d | (a32[:, b0 + 1] << (8 - r))
            if 8 - r + 8 < WINDOW + 8 and b0 + 2 < 33:
                d = d | (a32[:, b0 + 2] << (16 - r))
            out[i, w] = d & mask
    return out


# The bucketed Pippenger materializes (16, B, NWIN, n) planes (sorted point
# gathers, segmented partial sums); cap B·n per dispatch so peak HBM stays a
# few GB at k=17 bases (the k=17 keygen batching 16 commitments over 2^17
# bases OOM'd a 16 GB v5e; XLA additionally pads one of the intermediates
# 8x — see the northstar compile log — so the budget is conservative).
BATCH_LANE_BUDGET = int(os.environ.get("CIRCUITS_MSM_LANE_BUDGET", 1 << 17))


def _batch_chunk(nmsm: int, n: int) -> int:
    b = nmsm
    while b > 1 and b * n > BATCH_LANE_BUDGET:
        b //= 2
    return b


def msm_pippenger_device(points, scalar_rows):
    """Batched device Pippenger: one shared base set, B scalar vectors.

    points: host affine list (length n); scalar_rows: list of B lists of
    host ints (each ≤ n long; short rows are zero-padded). Returns a list of
    B host affine points (or None). Shapes are bucketed (n → power of two
    ≥ 64, B → power of two) so only a few distinct graphs ever compile;
    large batches are processed in memory-capped chunks.
    """
    xs, ys, valid = precompute_bases(points)
    n = int(xs.shape[1])
    nmsm = 1 << (max(1, len(scalar_rows)) - 1).bit_length()
    rows = list(scalar_rows) + [[0]] * (nmsm - len(scalar_rows))
    chunk_b = _batch_chunk(nmsm, n)
    mesh = _active_mesh(n)
    outs = []
    for lo in range(0, nmsm, chunk_b):
        digits = _scalars_to_digits(rows[lo : lo + chunk_b], n)
        take = min(chunk_b, len(scalar_rows) - lo)
        if mesh is not None:
            from ..parallel import msm_sharded as _MSh

            acc = _MSh.msm_sharded_device(mesh, xs, ys, valid, jnp.asarray(digits))
            ax, ay, az = np.asarray(acc[0]), np.asarray(acc[1]), np.asarray(acc[2])
            outs.extend(
                jac_to_affine_host(
                    (ax[:, i : i + 1], ay[:, i : i + 1], az[:, i : i + 1])
                )
                for i in range(take)
            )
        else:
            acc = _pippenger_device(
                xs, ys, valid, jnp.asarray(digits), n, chunk_b
            )
            outs.extend(_combine_windows_host(acc)[:take])
    return outs[: len(scalar_rows)]




def digits_from_mont(scal_mont: jax.Array) -> jax.Array:
    """Device WINDOW-bit digit extraction from Montgomery scalar columns:
    de-Montgomery to exact 16-bit limbs, then slice windows (any
    WINDOW ≤ 16). Returns (..., NWIN, m) int32 in _scalars_to_digits
    order. Shared by the single-device and shard_map paths."""
    one_plain = jnp.asarray(FJ.FR.const(1, mont=False)).reshape(
        (16,) + (1,) * (scal_mont.ndim - 1)
    )
    canon = FJ.mont_mul(scal_mont, one_plain)       # 16-bit limbs < p
    mask = NBUCKET - 1
    wins = []
    for w in range(NWIN):
        bit = WINDOW * w
        l0, r = divmod(bit, 16)
        d = canon[l0] >> r
        if r + WINDOW > 16 and l0 + 1 < 16:
            d = d | (canon[l0 + 1] << (16 - r))
        wins.append(d & mask)
    digits = jnp.stack(wins, axis=0)                # (NWIN, ..., m)
    return jnp.moveaxis(digits, 0, 1).astype(jnp.int32)

@functools.partial(jax.jit, static_argnames=("n", "nmsm"))
def _commit_dev(xs, ys, valid, scal_mont, n: int, nmsm: int):
    """Device-resident commit: (16, nmsm, m) Montgomery scalar columns →
    Jacobian accumulators, all inside ONE dispatch (de-Montgomery, byte
    digit extraction, Pippenger). m ≤ n; missing lanes are zero digits."""
    digits = digits_from_mont(scal_mont)            # (nmsm, NWIN, m)
    m = digits.shape[-1]
    if m < n:
        pad = jnp.zeros(digits.shape[:-1] + (n - m,), jnp.int32)
        digits = jnp.concatenate([digits, pad], axis=-1)
    return _pippenger_windows(xs, ys, valid, digits)


def msm_commit_dev(points, scal_mont):
    """Batched MSM of device-resident Montgomery scalar columns.

    points: host affine base list (cached on device after the first call);
    scal_mont: (16, B, m) Montgomery limb tensor (the prover's native
    column format — no host round-trip). Returns B host affine points.

    On non-accelerator backends falls back to pulling the columns once and
    running the host (native C++) Pippenger.
    """
    return msm_commit_dev_async(points, scal_mont)()


def msm_commit_dev_async(points, scal_mont):
    """Async variant of ``msm_commit_dev``: dispatches the device work and
    returns a zero-argument ``finish()`` that materializes the points.

    The prover uses this to overlap commitment materialization (a host↔
    device round-trip) with dispatching the NEXT phase's challenge-
    independent transforms (SURVEY §2c axis 4 — pipeline across proof
    phases): call async, enqueue the transforms, then finish() — the device
    works through the queue while the host blocks on the commitment pull.
    """
    b = int(scal_mont.shape[1])
    if not (_device_enabled() and len(points) >= DEVICE_THRESHOLD):
        from ..native import available as _native_ok, limbs16_to_ints

        flat = np.asarray(scal_mont).reshape(16, -1)
        if _native_ok():
            vals = limbs16_to_ints(flat, from_mont=True)
        else:
            r_inv = pow(1 << 256, -1, F.FR_MOD)
            vals = [v * r_inv % F.FR_MOD for v in FJ.limbs_to_ints(flat)]
        m = int(scal_mont.shape[2])
        rows = [vals[i * m : (i + 1) * m] for i in range(b)]
        out_host = [_msm_host(points[: len(row)], row) for row in rows]
        return lambda: out_host
    xs, ys, valid = precompute_bases(points)
    n = int(xs.shape[1])
    nmsm = 1 << (max(1, b) - 1).bit_length()
    if nmsm > b:
        pad = jnp.zeros((16, nmsm - b) + scal_mont.shape[2:], jnp.uint32)
        scal_mont = jnp.concatenate([scal_mont, pad], axis=1)
    chunk_b = _batch_chunk(nmsm, n)
    mesh = _active_mesh(n)
    accs = []
    for lo in range(0, nmsm, chunk_b):
        sm = scal_mont[:, lo : lo + chunk_b]
        if mesh is not None:
            from ..parallel import msm_sharded as _MSh

            m = int(sm.shape[2])
            if m < n:
                padn = jnp.zeros((16, chunk_b, n - m), jnp.uint32)
                sm = jnp.concatenate([sm, padn], axis=2)
            accs.append(_MSh.commit_sharded_device(mesh, xs, ys, valid, sm))
        else:
            accs.append(_commit_dev(xs, ys, valid, sm, n, chunk_b))

    def finish():
        out = []
        for acc in accs:
            if acc[0].ndim == 3:  # (16, B, NWIN) window sums (single device)
                out.extend(_combine_windows_host(acc))
                continue
            ax, ay, az = np.asarray(acc[0]), np.asarray(acc[1]), np.asarray(acc[2])
            out.extend(
                jac_to_affine_host(
                    (ax[:, i : i + 1], ay[:, i : i + 1], az[:, i : i + 1])
                )
                for i in range(ax.shape[1])
            )
        return out[:b]

    return finish


def _active_mesh(n: int):
    """The prover-sharding mesh for an n-lane MSM, or None.

    Requires n divisible by the mesh size and large enough that each shard
    keeps the ≥256-lane chunked-scan minimum (parallel/auto policy decides
    whether a mesh exists at all)."""
    from ..parallel import auto as _auto

    mesh = _auto.get_mesh()
    if mesh is None:
        return None
    nd = mesh.devices.size
    if n % nd or n // nd < 256:
        return None
    return mesh


def _device_enabled() -> bool:
    mode = os.environ.get("CIRCUITS_MSM_DEVICE", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


# Device path pays one dispatch + digit prep; below this it loses to host.
DEVICE_THRESHOLD = 512


def _msm_host(points, scalars):
    """Host MSM: native C++ Pippenger when built, else the Python one."""
    from ..native import available as _native_ok, g1_msm as _native_msm

    if _native_ok():
        return _native_msm(points, [s % F.FR_MOD for s in scalars])
    return C.g1_msm_pippenger(points, scalars)


def msm_auto(points, scalars):
    """Dispatch one MSM to the device Pippenger when it wins, else host.

    The device path is used on accelerator backends for n ≥ DEVICE_THRESHOLD
    (override with CIRCUITS_MSM_DEVICE=0/1); the host Pippenger (native C++
    `fieldcc.g1_msm`, mirroring `best_multiexp`, with a pure-Python fallback)
    is the correctness reference.
    """
    if len(points) >= DEVICE_THRESHOLD and _device_enabled():
        return msm_pippenger_device(points, [scalars])[0]
    return _msm_host(points, scalars)


def msm_auto_batch(points, scalar_rows):
    """Batched MSMs over one base set (advice/fixed column commitments)."""
    if len(points) >= DEVICE_THRESHOLD and _device_enabled():
        return msm_pippenger_device(points, scalar_rows)
    return [_msm_host(points, row) for row in scalar_rows]

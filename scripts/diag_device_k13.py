"""Bisect the k=13 TPU prove divergence (criterion 'quotient degree
overflow' on device while the identical CPU prove verifies).

Checks every device primitive the k>=13 prove uses at its REAL shapes
against the host reference: NTT/iNTT at 8192/32768 (fourstep path on TPU),
the two-level prefix/suffix scans (powers, cumprod, batched inversion,
linear division) at 8192/32768, and the batched-column transform
(lagrange->coeff->extended roundtrip) at k=13. Prints PASS/FAIL per
primitive — the first FAIL is the broken kernel.

Run on the real TPU (takes the tunnel lock).
"""

import os
import random
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from circuits_halo2_tpu.utils.tpulock import TpuLock  # noqa: E402

_lock = TpuLock()
_lock.__enter__()

from circuits_halo2_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from circuits_halo2_tpu.ops import field as F  # noqa: E402
from circuits_halo2_tpu.ops import field_jax as FJ  # noqa: E402
from circuits_halo2_tpu.ops import ntt as NTT  # noqa: E402
from circuits_halo2_tpu.utils import poly_device as PD  # noqa: E402

P = F.FR_MOD
R_INV = pow(1 << 256, -1, P)
rng = random.Random(17)


def to_dev(vals):
    return jnp.asarray(FJ.ints_to_limbs([(v << 256) % P for v in vals]))


def from_dev(arr):
    return [v * R_INV % P for v in FJ.limbs_to_ints(np.asarray(arr))]


def check(name, got, exp):
    ok = got == exp
    if not ok:
        bad = next(i for i, (g, e) in enumerate(zip(got, exp)) if g != e)
        nbad = sum(1 for g, e in zip(got, exp) if g != e)
        print(f"FAIL {name}: {nbad}/{len(exp)} lanes wrong, first at {bad}",
              flush=True)
    else:
        print(f"PASS {name}", flush=True)
    return ok


def main():
    t0 = time.time()
    for n in (8192, 32768):
        vals = [rng.randrange(P) for _ in range(n)]
        a = to_dev(vals)
        omega = NTT.omega_for_k(n.bit_length() - 1)

        got = from_dev(NTT.ntt(a, omega))
        exp = NTT.ntt_host(vals, omega)
        check(f"ntt n={n}", got, exp)

        got = from_dev(NTT.intt(a, omega))
        ninv = F.fr_inv(n)
        exp = [v * ninv % P for v in NTT.ntt_host(vals, F.fr_inv(omega))]
        check(f"intt n={n}", got, exp)

        x = rng.randrange(P)
        got = from_dev(PD.powers_dev(x, n))
        exp, acc = [], 1
        for _ in range(n):
            exp.append(acc)
            acc = acc * x % P
        check(f"powers n={n}", got, exp)

        got = from_dev(PD.mont_cumprod(a))
        exp, acc = [], 1
        for v in vals:
            acc = acc * v % P
            exp.append(acc)
        check(f"cumprod n={n}", got, exp)

        got = from_dev(PD.batch_inv_dev(a))
        exp = [pow(v, -1, P) for v in vals]
        check(f"batch_inv n={n}", got, exp)

        z = rng.randrange(1, P)
        q = [rng.randrange(P) for _ in range(n - 1)]
        c = [0] * n
        for i, qi in enumerate(q):
            c[i] = (c[i] - z * qi) % P
            c[i + 1] = (c[i + 1] + qi) % P
        got = from_dev(PD.divide_linear_dev(to_dev(c), z))
        check(f"divide_linear n={n}", got, q + [0])
        print(f"-- n={n} done at +{time.time()-t0:.0f}s", flush=True)

    # k=13 domain transform roundtrip (coeff -> extended -> back)
    from circuits_halo2_tpu.models.prover import transform_cols

    dom = PD.domain(13, 5)
    cols = [[rng.randrange(P) for _ in range(dom.n)] for _ in range(4)]
    lagr = dom.cols_to_device(cols)
    coeff, ext = transform_cols(dom, lagr)
    back = dom.coeff_to_lagrange(coeff)
    check("transform coeff roundtrip k=13",
          [v * R_INV % P for v in FJ.limbs_to_ints(
              np.asarray(back).reshape(16, -1))],
          [v for col in cols for v in col])
    rec = dom.extended_to_coeff(ext)[..., : dom.n]
    check("extended->coeff matches coeff k=13",
          from_dev(np.asarray(rec).reshape(16, -1)),
          from_dev(np.asarray(coeff).reshape(16, -1)))
    print(f"all checks done at +{time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

"""Fast-path Poseidon tests: scan-free 15-bit-limb arithmetic and the
Pallas kernel (interpret mode on CPU) against the host reference."""

import random

import pytest

from circuits_halo2_tpu.ops import field as F
from circuits_halo2_tpu.ops import poseidon as P

rng = random.Random(2024)


def _msgs(length, n):
    out = [[rng.randrange(F.FR_MOD) for _ in range(length)] for _ in range(n)]
    out[0] = [0] * length
    out[-1] = [F.FR_MOD - 1] * length
    return out


def test_fast_path_matches_host():
    from circuits_halo2_tpu.ops import poseidon_fast as PF

    for length in (3, 4):
        msgs = _msgs(length, 9)
        assert PF.hash_many15(msgs) == [P.hash_n(m) for m in msgs]


def test_fast_limb_roundtrip():
    from circuits_halo2_tpu.ops import poseidon_fast as PF

    xs = [0, 1, F.FR_MOD - 1, rng.randrange(F.FR_MOD)]
    limbs = PF.ints_to_limbs15(xs)
    assert PF.limbs15_to_ints(limbs) == xs


@pytest.mark.skipif(
    not __import__("os").environ.get("CIRCUITS_TPU_SLOW"),
    reason="pallas interpret mode is slow on CPU; run with CIRCUITS_TPU_SLOW=1",
)
def test_pallas2_kernel_matches_host():
    """Production per-limb kernel (v2): leaf (L=3) and middle (L=4) sponge
    lengths, including the lazy-MDS/squaring fast paths, must match the
    host Poseidon bit-exactly."""
    from circuits_halo2_tpu.ops import poseidon_pallas2 as PP2

    for length in (3, 4):
        msgs = _msgs(length, 2)
        assert PP2.hash_many_pallas2(msgs) == [P.hash_n(m) for m in msgs]

"""Round-number calculator parity: the canonical instance must reproduce
the generated parameters' R_F=8, R_P=56 (`poseidon_params.rs` header)."""

from circuits_halo2_tpu.ops.poseidon_round_numbers import find_round_numbers


def test_canonical_instance():
    assert find_round_numbers(254, 2, 128) == (8, 56)


def test_other_widths_sane():
    for t in (3, 5):
        r_f, r_p = find_round_numbers(254, t, 128)
        assert r_f >= 8 and r_p >= 30
        assert r_p % 2 == 0

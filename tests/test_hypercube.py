"""BooleanHypercube properties (reference arithmetic.rs:459-487 tests the
same invariants, there marked #[ignore] for being slow at 32 vars; small
sizes are instant and equally binding)."""

from snark_verifier_tpu.utils.hypercube import BooleanHypercube, primitive_poly


def test_generated_primitives_match_reference_table():
    # spot-check the canonical minimal primitive polynomials
    assert primitive_poly(2) == 7  # x^2+x+1
    assert primitive_poly(3) == 11  # x^3+x+1
    assert primitive_poly(4) == 19  # x^4+x+1
    assert primitive_poly(5) == 37  # x^5+x^2+1
    assert primitive_poly(8) == 285  # x^8+x^4+x^3+x^2+1
    assert primitive_poly(10) == 1033  # x^10+x^3+1


def test_iteration_is_permutation():
    for n in range(1, 12):
        seen = list(BooleanHypercube(n))
        assert sorted(seen) == list(range(1 << n))


def test_prev_next_inverse():
    for n in (3, 7, 11):
        bh = BooleanHypercube(n)
        for b in range(1, 1 << n):
            assert bh.prev(bh.next(b)) == b
            assert bh.next(bh.prev(b)) == b
            assert bh.rotate(bh.rotate(b, 3), -3) == b

"""G1 group-law KATs vs the pure-Python affine oracle (SURVEY.md §7 stage 2)."""

import jax
import numpy as np
import pytest

from snark_verifier_tpu.ec import (
    G1,
    from_affine_int,
    generator,
    msm_naive,
    py_ec,
    scalars_to_bits,
    to_affine_int,
)


@pytest.fixture(scope="module")
def pts():
    return py_ec.rand_points(8, seed=11)


def test_add_random(pts):
    a = from_affine_int(pts[:4])
    b = from_affine_int(pts[4:])
    got = to_affine_int(jax.jit(G1.add)(a, b))
    want = [py_ec.add(p, q) for p, q in zip(pts[:4], pts[4:])]
    assert got == want


def test_double_and_add_same_point(pts):
    a = from_affine_int(pts[:4])
    want = [py_ec.double(p) for p in pts[:4]]
    assert to_affine_int(jax.jit(G1.double)(a)) == want
    # complete addition must also handle P + P
    assert to_affine_int(jax.jit(G1.add)(a, a)) == want


def test_add_inverse_gives_infinity(pts):
    a = from_affine_int(pts[:4])
    na = from_affine_int([py_ec.neg(p) for p in pts[:4]])
    got = to_affine_int(jax.jit(G1.add)(a, na))
    assert got == [None] * 4


def test_add_infinity(pts):
    a = from_affine_int(pts[:2])
    inf = from_affine_int([None, None])
    assert to_affine_int(jax.jit(G1.add)(a, inf)) == pts[:2]
    assert to_affine_int(jax.jit(G1.add)(inf, a)) == pts[:2]
    assert to_affine_int(jax.jit(G1.add)(inf, inf)) == [None, None]


def test_scalar_mul(pts):
    ks = [0, 1, 2, 12345678901234567890]
    a = from_affine_int([pts[0]] * len(ks))
    bits = scalars_to_bits(ks)
    got = to_affine_int(jax.jit(jax.vmap(G1.scalar_mul_bits))(a, bits))
    want = [py_ec.scalar_mul(pts[0], k) for k in ks]
    assert got == want


def test_msm_naive(pts):
    ks = [3, 0, 7, 123456789, 2**250 + 5, 1, 2, 9999]
    a = from_affine_int(pts)
    bits = scalars_to_bits(ks)
    got = to_affine_int(jax.jit(msm_naive)(a, bits))
    assert got == py_ec.msm(pts, ks)


def test_generator_on_curve():
    g = to_affine_int(generator())
    assert py_ec.is_on_curve(g) and g == (1, 2)

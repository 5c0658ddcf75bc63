"""Known-answer tests for the limb field core vs python-int arithmetic.

This is the stage-1 bit-exactness gate from SURVEY.md §7: random-op KATs where
the gold model is arbitrary-precision Python integers (the same values
halo2curves produces, since both implement Z/pZ exactly)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ff import FQ, FR, FQ_FIELD, FR_FIELD, NLIMBS

FIELDS = [(FQ, FQ_FIELD), (FR, FR_FIELD)]


def rand_ints(spec, n, seed):
    rng = random.Random(seed)
    return [rng.randrange(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec,F", FIELDS, ids=["fq", "fr"])
def test_roundtrip(spec, F):
    xs = rand_ints(spec, 8, 1) + [0, 1, spec.p - 1]
    a = F.from_int(xs)
    got = F.to_int(a)
    assert [int(g) for g in got] == xs


@pytest.mark.parametrize("spec,F", FIELDS, ids=["fq", "fr"])
def test_add_sub_neg(spec, F):
    xs = rand_ints(spec, 16, 2) + [0, 1, spec.p - 1, spec.p - 1]
    ys = rand_ints(spec, 16, 3) + [0, spec.p - 1, 1, spec.p - 1]
    a, b = F.from_int(xs), F.from_int(ys)
    assert list(F.to_int(F.add(a, b))) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    assert list(F.to_int(F.sub(a, b))) == [(x - y) % spec.p for x, y in zip(xs, ys)]
    assert list(F.to_int(F.neg(a))) == [(-x) % spec.p for x in xs]


@pytest.mark.parametrize("spec,F", FIELDS, ids=["fq", "fr"])
def test_mul_square(spec, F):
    xs = rand_ints(spec, 16, 4) + [0, 1, spec.p - 1]
    ys = rand_ints(spec, 16, 5) + [spec.p - 1, spec.p - 1, spec.p - 1]
    a, b = F.from_int(xs), F.from_int(ys)
    assert list(F.to_int(F.mul(a, b))) == [(x * y) % spec.p for x, y in zip(xs, ys)]
    assert list(F.to_int(F.square(a))) == [(x * x) % spec.p for x in xs]


@pytest.mark.parametrize("spec,F", FIELDS, ids=["fq", "fr"])
def test_inv_and_batch_inv(spec, F):
    xs = rand_ints(spec, 8, 6) + [1, spec.p - 1, 0]
    a = F.from_int(xs)
    want = [pow(x, -1, spec.p) if x else 0 for x in xs]
    assert list(F.to_int(F.inv(a))) == want
    assert list(F.to_int(F.batch_inv(a))) == want


@pytest.mark.parametrize("spec,F", FIELDS, ids=["fq", "fr"])
def test_pow_static(spec, F):
    xs = rand_ints(spec, 4, 7)
    a = F.from_int(xs)
    for e in [0, 1, 2, 5, (spec.p - 1) // 2]:
        assert list(F.to_int(F.pow_static(a, e))) == [pow(x, e, spec.p) for x in xs]


def test_mul_small():
    F, spec = FQ_FIELD, FQ
    xs = rand_ints(spec, 4, 8)
    a = F.from_int(xs)
    for k in [0, 1, 2, 3, 8, 9, 24]:
        assert list(F.to_int(F.mul_small(a, k))) == [(x * k) % spec.p for x in xs]


def test_predicates_and_select():
    F, spec = FR_FIELD, FR
    a = F.from_int([0, 5, 0, 7])
    b = F.from_int([1, 5, 2, 3])
    assert list(np.asarray(F.is_zero(a))) == [True, False, True, False]
    assert list(np.asarray(F.eq(a, b))) == [False, True, False, False]
    sel = F.select(F.eq(a, b), a, b)
    assert list(F.to_int(sel)) == [1, 5, 2, 3]


def test_broadcasting():
    F, spec = FQ_FIELD, FQ
    xs = rand_ints(spec, 6, 9)
    a = F.from_int(xs).reshape(2, 3, NLIMBS)
    b = F.from_int([3])
    out = F.to_int(F.mul(a, b)).reshape(-1)
    assert [int(v) for v in out] == [(x * 3) % spec.p for x in xs]

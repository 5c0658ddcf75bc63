"""Tower field KATs: device Fq2/Fq6/Fq12 vs the python-int pairing oracle."""

import random

import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ff.spec import FQ
from snark_verifier_tpu.pairing import py_pairing as pp
from snark_verifier_tpu.tower import (
    FQ2,
    FQ6,
    FQ12,
    fq2_from_int,
    fq2_to_int,
    fq6_from_int,
    fq6_to_int,
    fq12_from_int,
    fq12_to_int,
)


def rand_f2(rng):
    return (rng.randrange(FQ.p), rng.randrange(FQ.p))


def rand_f6(rng):
    return tuple(rand_f2(rng) for _ in range(3))


def rand_f12(rng):
    return tuple(rand_f6(rng) for _ in range(2))


def test_fq2_ops():
    rng = random.Random(1)
    a, b = rand_f2(rng), rand_f2(rng)
    da, db = fq2_from_int(a), fq2_from_int(b)
    assert fq2_to_int(FQ2.add(da, db)) == pp.f2_add(a, b)
    assert fq2_to_int(FQ2.sub(da, db)) == pp.f2_sub(a, b)
    assert fq2_to_int(FQ2.neg(da)) == pp.f2_neg(a)
    assert fq2_to_int(FQ2.mul(da, db)) == pp.f2_mul(a, b)
    assert fq2_to_int(FQ2.square(da)) == pp.f2_sq(a)
    assert fq2_to_int(FQ2.conj(da)) == pp.f2_conj(a)
    assert fq2_to_int(FQ2.mul_xi(da)) == pp.f2_mul_xi(a)
    assert fq2_to_int(FQ2.inv(da)) == pp.f2_inv(a)


def test_fq2_batched():
    rng = random.Random(2)
    pairs = [(rand_f2(rng), rand_f2(rng)) for _ in range(4)]
    da = jnp.stack([fq2_from_int(a) for a, _ in pairs])
    db = jnp.stack([fq2_from_int(b) for _, b in pairs])
    out = FQ2.mul(da, db)
    for i, (a, b) in enumerate(pairs):
        assert fq2_to_int(out[i]) == pp.f2_mul(a, b)


def test_fq6_ops():
    rng = random.Random(3)
    a, b = rand_f6(rng), rand_f6(rng)
    da, db = fq6_from_int(a), fq6_from_int(b)
    assert fq6_to_int(FQ6.mul(da, db)) == pp.f6_mul(a, b)
    assert fq6_to_int(FQ6.mul_by_v(da)) == pp.f6_mul_by_v(a)
    assert fq6_to_int(FQ6.inv(da)) == pp.f6_inv(a)
    assert fq6_to_int(FQ6.add(da, db)) == pp.f6_add(a, b)


def test_fq12_ops():
    rng = random.Random(4)
    a, b = rand_f12(rng), rand_f12(rng)
    da, db = fq12_from_int(a), fq12_from_int(b)
    assert fq12_to_int(FQ12.mul(da, db)) == pp.f12_mul(a, b)
    assert fq12_to_int(FQ12.square(da)) == pp.f12_sq(a)
    assert fq12_to_int(FQ12.conj(da)) == pp.f12_conj(a)
    assert fq12_to_int(FQ12.inv(da)) == pp.f12_inv(a)


def test_fq12_mul_by_034():
    rng = random.Random(5)
    f = rand_f12(rng)
    c0, c3, c4 = rand_f2(rng), rand_f2(rng), rand_f2(rng)
    df = fq12_from_int(f)
    out = FQ12.mul_by_034(df, fq2_from_int(c0), fq2_from_int(c3), fq2_from_int(c4))
    assert fq12_to_int(out) == pp.f12_mul_by_034(f, c0, c3, c4)


def test_fq12_pow_and_is_one():
    rng = random.Random(6)
    a = rand_f12(rng)
    da = fq12_from_int(a)
    e = 0xDEADBEEF12345
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.uint32)
    got = fq12_to_int(FQ12.pow_bits(da, bits))
    assert got == pp.f12_pow(a, e)
    assert bool(FQ12.is_one(fq12_from_int(pp.F12_ONE)))
    assert not bool(FQ12.is_one(da))

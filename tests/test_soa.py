"""SoA (limb-major) field/EC ops vs the AoS implementation and oracle."""

import random

import jax
import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int
from snark_verifier_tpu.ec import soa_curve as S
from snark_verifier_tpu.ff import FQ, FQ_FIELD
from snark_verifier_tpu.ff import soa_field as SF


def test_soa_field_ops():
    rng = random.Random(1)
    xs = [rng.randrange(FQ.p) for _ in range(4)]
    ys = [rng.randrange(FQ.p) for _ in range(4)]
    a = SF.from_aos(FQ_FIELD.from_int(xs))  # (16, 4)
    b = SF.from_aos(FQ_FIELD.from_int(ys))
    got_mul = FQ_FIELD.to_int(SF.to_aos(SF.mul(a, b)))
    assert [int(v) % FQ.p for v in got_mul] == [x * y % FQ.p for x, y in zip(xs, ys)]
    got_add = FQ_FIELD.to_int(SF.to_aos(SF.add(a, b)))
    assert [int(v) % FQ.p for v in got_add] == [(x + y) % FQ.p for x, y in zip(xs, ys)]
    got_sub = FQ_FIELD.to_int(SF.to_aos(SF.sub(a, b)))
    assert [int(v) % FQ.p for v in got_sub] == [(x - y) % FQ.p for x, y in zip(xs, ys)]


def test_soa_ec_add_double():
    pts = py_ec.rand_points(8, seed=3)
    P = S.from_aos(from_affine_int(pts[:4]))
    Q = S.from_aos(from_affine_int(pts[4:]))
    got = to_affine_int(S.to_aos(jax.jit(S.add)(P, Q)))
    assert got == [py_ec.add(a, b) for a, b in zip(pts[:4], pts[4:])]
    got2 = to_affine_int(S.to_aos(jax.jit(S.double)(P)))
    assert got2 == [py_ec.double(a) for a in pts[:4]]
    # complete law: P + P, P + inf, P + (-P)
    same = to_affine_int(S.to_aos(jax.jit(S.add)(P, P)))
    assert same == got2
    inf = S.infinity((4,))
    assert to_affine_int(S.to_aos(jax.jit(S.add)(P, inf))) == pts[:4]
    negs = S.from_aos(from_affine_int([py_ec.neg(p) for p in pts[:4]]))
    assert to_affine_int(S.to_aos(jax.jit(S.add)(P, negs))) == [None] * 4

"""RNS/MXU Fq12 tower (tower/rns_tower.py) vs the python-int oracle, and the
RNS pairing path end-to-end (reference role: halo2curves tower + pairing as
used by the decider, snark-verifier/src/pcs/kzg/decider.rs:60-80)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ec import py_ec
from snark_verifier_tpu.ff.spec import FQ
from snark_verifier_tpu.pairing import py_pairing as pp
from snark_verifier_tpu.pairing.pairing import pairing_check, prepare_pairs
from snark_verifier_tpu.tower.rns_tower import get_rns_tower

rt = get_rns_tower()
R = rt.R
rng = random.Random(7)


def rf2():
    return (rng.randrange(FQ.p), rng.randrange(FQ.p))


def rf12():
    return tuple(tuple(rf2() for _ in range(3)) for _ in range(2))


def enc12(x):
    flat = [c for f6 in x for f2 in f6 for c in f2]
    return jnp.asarray(np.asarray(R.from_int(flat)).reshape(2, 3, 2, 35))


def enc2(x):
    return jnp.asarray(np.asarray(R.from_int(list(x))).reshape(2, 35))


def dec12(a):
    ints = R.to_int(a)
    return tuple(
        tuple(tuple(int(ints[i, j, k]) for k in range(2)) for j in range(3))
        for i in range(2)
    )


def test_mul_square_conj_vs_oracle():
    a, b = rf12(), rf12()
    A, B = enc12(a), enc12(b)
    assert dec12(jax.jit(rt.mul12)(A, B)) == pp.f12_mul(a, b)
    assert dec12(jax.jit(rt.square12)(A)) == pp.f12_sq(a)
    assert dec12(rt.conj12(A)) == pp.f12_conj(a)


def test_mul_by_034_and_smul():
    a = rf12()
    c0, c3, c4 = rf2(), rf2(), rf2()
    got = dec12(jax.jit(rt.mul_by_034)(enc12(a), enc2(c0), enc2(c3), enc2(c4)))
    assert got == pp.f12_mul_by_034(a, c0, c3, c4)
    s = rng.randrange(FQ.p)
    S = jnp.asarray(np.asarray(R.from_int(s)))
    got2 = tuple(int(v) for v in np.asarray(R.to_int(rt.smul2(enc2(c0), S))).ravel())
    assert got2 == pp.f2_smul(c0, s)


def test_chained_bounds_stay_exact():
    """Stress the static bound tracking: a chain of products, squares and
    conjugations must stay bit-exact (a bound violation would corrupt the
    k_p offsets silently — this is the regression gate for that)."""
    a, b = rf12(), rf12()

    def chain(A, B):
        x = rt.mul12(A, B)
        x = rt.square12(x)
        x = rt.mul12(x, rt.conj12(x))
        return rt.square12(x)

    got = dec12(jax.jit(chain)(enc12(a), enc12(b)))
    w = pp.f12_mul(a, b)
    w = pp.f12_sq(w)
    w = pp.f12_mul(w, pp.f12_conj(w))
    assert got == pp.f12_sq(w)


def test_is_one():
    one12 = (((1, 0), (0, 0), (0, 0)), ((0, 0), (0, 0), (0, 0)))
    assert bool(jax.jit(rt.is_one12)(enc12(one12)))
    assert not bool(jax.jit(rt.is_one12)(enc12(rf12())))


def test_rns_pairing_check_accept_reject():
    """Full RNS pairing (Miller scan + tape final exp on the RNS tower):
    e(aG1, G2) · e(−G1, aG2) == 1, and reject when the scalar is off."""
    g1, g2 = py_ec.G1_GEN, pp.G2_GEN
    a = 123456789123456789
    good = [(py_ec.scalar_mul(g1, a), g2), (py_ec.neg(g1), pp.g2_scalar_mul(g2, a))]
    bad = [(py_ec.scalar_mul(g1, a + 1), g2), (py_ec.neg(g1), pp.g2_scalar_mul(g2, a))]
    f = jax.jit(lambda *A: pairing_check(*A, rns=True))
    assert bool(f(*prepare_pairs(good)))
    assert not bool(f(*prepare_pairs(bad)))

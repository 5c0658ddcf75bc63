"""RNS/MXU field core: bit-exactness vs the positional core, bound tracking,
and EC group-law parity.  (Reference anchor: same role as halo2curves'
arithmetic under /root/reference/snark-verifier/src/util/arithmetic.rs.)"""

import numpy as np
import pytest

import jax

from snark_verifier_tpu.ff import FQ, FQ_FIELD
from snark_verifier_tpu.ff.rns_field import get_rns_field
from snark_verifier_tpu.ff.rns_spec import spec_for

R = get_rns_field(FQ)
P = FQ.p


def rand_ints(n, seed=0):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32)) % P for _ in range(n)]


def test_mul_add_sub_neg_exact():
    a_i, b_i = rand_ints(32, 1), rand_ints(32, 2)
    a, b = R.from_int(a_i), R.from_int(b_i)
    assert (R.to_int(jax.jit(R.mul)(a, b)) == np.array([x * y % P for x, y in zip(a_i, b_i)], dtype=object)).all()
    assert (R.to_int(R.add(a, b)) == np.array([(x + y) % P for x, y in zip(a_i, b_i)], dtype=object)).all()
    assert (R.to_int(R.sub(a, b)) == np.array([(x - y) % P for x, y in zip(a_i, b_i)], dtype=object)).all()
    assert (R.to_int(R.neg(a)) == np.array([-x % P for x in a_i], dtype=object)).all()
    assert (R.to_int(R.mul_small(a, 9)) == np.array([9 * x % P for x in a_i], dtype=object)).all()


def test_limb_roundtrip():
    F = FQ_FIELD
    a_i = rand_ints(32, 3)
    lim = F.from_int(a_i)
    rns = jax.jit(R.from_limbs)(lim)
    assert (R.to_int(rns) == np.array(a_i, dtype=object)).all()
    assert np.array_equal(np.asarray(jax.jit(R.to_limbs)(rns)), np.asarray(F.canon(lim)))


def test_large_bound_values():
    """Ops stay exact when values accumulate far beyond p (the lazy-reduction
    headroom the EC formulas rely on)."""
    a_i, b_i = rand_ints(8, 4), rand_ints(8, 5)
    a, b = R.from_int(a_i), R.from_int(b_i)
    x = a
    for _ in range(9):  # value 512 * a: ~ 2^9 * p
        x = R.add(x, x)
    y = R.mul(x, b)
    assert (R.to_int(y) == np.array([x0 * 512 * y0 % P for x0, y0 in zip(a_i, b_i)], dtype=object)).all()
    x5 = a
    for _ in range(5):
        x5 = R.add(x5, x5)
    assert (np.array(R.to_int(R.from_limbs(R.to_limbs(x5))), dtype=object) == np.array([32 * v % P for v in a_i], dtype=object)).all()


def test_residues_strictly_reduced():
    a, b = R.from_int(rand_ints(16, 6)), R.from_int(rand_ints(16, 7))
    mods = np.asarray(R.MODS)
    for op in (R.mul(a, b), R.add(a, b), R.sub(a, b), R.neg(a)):
        assert (np.asarray(op) < mods).all()


def test_inv_is_zero():
    a_i = rand_ints(8, 8)
    a = R.from_int(a_i)
    assert (R.to_int(jax.jit(R.inv)(a)) == np.array([pow(x, -1, P) for x in a_i], dtype=object)).all()
    assert np.asarray(R.is_zero(R.sub(a, a))).all()
    assert not np.asarray(R.is_zero(a)).any()


def test_bound_headroom_static():
    """Static proof of the mul precondition: with every coordinate < 2^14 p
    (far above the ~1024p the EC formulas reach), a*b < M*(M2 - 17p)."""
    s = spec_for(FQ)
    bound = (1 << 14) * P
    assert bound * bound < s.M * (s.M2 - 17 * P)


def test_ec_bound_replay():
    """Symbolic replay of the RC15 formulas (ec/curve.py add/double) over
    value BOUNDS: proves (a) the 1024p sub offset always covers the
    subtrahend, (b) mul inputs stay inside the Montgomery-RNS precondition,
    (c) coordinate bounds reach a closed fixed point under iteration."""
    s = spec_for(FQ)
    MUL_LIMIT = s.M * (s.M2 - 17 * P)

    def mul(a, b):
        assert a * b < MUL_LIMIT, "mul precondition violated"
        return a * b // s.M + 17 * P

    def sub(a, b):
        assert b <= 1024 * P, f"sub offset < bound(b) = {b / P:.0f}p"
        return a + 1024 * P

    OFF = (1 << 27) * P * P  # RnsField.lazy_sub offset

    def lazy_mul(a, b):  # product VALUE bound (no reduction yet)
        assert a * b < MUL_LIMIT
        return a * b

    def reduce_d(d):
        return d // s.M + 17 * P

    def add_bounds(c):  # RC15 add (lazy layer 2) with inputs bounded by c
        m = mul(2 * c, 2 * c)  # products of coord sums
        t3 = sub(m, 2 * m)
        t4 = ty = t3
        t0_3, t2b = 3 * m, 9 * m
        z3l = m + t2b
        t1m = sub(m, t2b)
        yb = 9 * ty
        d = max(
            lazy_mul(t3, t1m), lazy_mul(t4, yb), lazy_mul(yb, t0_3),
            lazy_mul(t1m, z3l), lazy_mul(t0_3, t3), lazy_mul(z3l, t4),
        )
        assert d < OFF, "lazy_sub offset must cover any layer-2 product"
        return reduce_d(max(d + OFF, 2 * d))  # x3 / y3, z3

    def double_bounds(c):
        m = mul(c, c)
        z8, t2 = 8 * m, 9 * m
        y3l = m + t2
        t0m = sub(m, 3 * t2)
        d = max(lazy_mul(t2, z8), lazy_mul(m, z8), lazy_mul(t0m, y3l),
                lazy_mul(t0m, m))
        assert d < OFF
        return reduce_d(2 * d)

    c = 20 * P  # fresh mul/from_limbs output bound
    for _ in range(8):  # iterate to a fixed point; assert closure
        c_new = max(add_bounds(c), double_bounds(c))
        assert c_new < (1 << 13) * P, "coordinate bounds diverge"
        if c_new == c:
            break
        c = c_new


def test_ec_parity_vs_positional():
    """RC15 over RNS coordinates matches the positional curve bit-for-bit
    (after canonicalization), including re-feeding outputs."""
    from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int
    from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns

    pts = py_ec.rand_points(8, seed=11)
    qts = py_ec.rand_points(8, seed=12)
    pr = to_rns(from_affine_int(pts))
    qr = to_rns(from_affine_int(qts))

    s = jax.jit(G1R.add)(pr, qr)
    s2 = jax.jit(G1R.add)(s, s)  # re-feed outputs: bounds must stay closed
    s3 = jax.jit(G1R.double)(s2)
    got = to_affine_int(from_rns(s3))
    exp = [py_ec.double(py_ec.double(py_ec.add(a, b))) for a, b in zip(pts, qts)]
    assert got == exp


def test_ec_identity_and_doubling_cases():
    from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int
    from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns

    pts = py_ec.rand_points(4, seed=13)
    pr = to_rns(from_affine_int(pts))
    inf = G1R.infinity((4,))
    # P + inf = P
    assert to_affine_int(from_rns(G1R.add(pr, inf))) == pts
    # P + (-P) = inf
    npr = G1R.neg(pr)
    assert to_affine_int(from_rns(G1R.add(pr, npr))) == [None] * 4
    # P + P = double(P) (completeness)
    assert to_affine_int(from_rns(G1R.add(pr, pr))) == [py_ec.double(a) for a in pts]

"""Packed (105-lane) RNS field + RC15 group law vs the unpacked reference
path — bit-exact residue equality (ff/rns_packed.py vs ff/rns_field.py +
ec/curve.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from snark_verifier_tpu.ec.rns_g1 import FQ_RNS, G1R
from snark_verifier_tpu.ff import FQ
from snark_verifier_tpu.ff.rns_packed import (
    SEG,
    add_packed,
    get_packed_field,
)

rng = np.random.default_rng(7)
FP = get_packed_field(FQ)


def rand_elems(n):
    """(n, 35) uint16 RNS residues of random field values."""
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % FQ.p
            for _ in range(n)]
    return jnp.asarray(np.asarray(FQ_RNS.from_int(vals)))


def pack3(a, b, c):
    return jnp.concatenate([a, b, c], axis=-1)


def test_field_ops_match_unpacked():
    n = 8
    xs, ys, zs = rand_elems(n), rand_elems(n), rand_elems(n)
    us, vs, ws = rand_elems(n), rand_elems(n), rand_elems(n)
    p1, p2 = pack3(xs, ys, zs), pack3(us, vs, ws)
    for op in ("add", "sub", "mul", "neg", "double"):
        f_pk = getattr(FP, op)
        f_un = getattr(FQ_RNS, op)
        if op in ("neg", "double"):
            got = np.asarray(f_pk(p1))
            want = np.concatenate(
                [np.asarray(f_un(t)) for t in (xs, ys, zs)], axis=-1
            )
        else:
            got = np.asarray(f_pk(p1, p2))
            want = np.concatenate(
                [np.asarray(f_un(a, b)) for a, b in ((xs, us), (ys, vs), (zs, ws))],
                axis=-1,
            )
        assert (got == want).all(), op


def test_mul_small_and_lazy_match():
    n = 8
    xs, ys, zs = rand_elems(n), rand_elems(n), rand_elems(n)
    us, vs, ws = rand_elems(n), rand_elems(n), rand_elems(n)
    p1, p2 = pack3(xs, ys, zs), pack3(us, vs, ws)
    got = np.asarray(FP.mul_small(p1, 9))
    want = np.concatenate(
        [np.asarray(FQ_RNS.mul_small(t, 9)) for t in (xs, ys, zs)], -1
    )
    assert (got == want).all()
    d_pk = FP.lazy_sub(FP.mul_lazy(p1, p2), FP.mul_lazy(p2, p2))
    got = np.asarray(FP.reduce_d(d_pk))
    want = []
    for a, b in ((xs, us), (ys, vs), (zs, ws)):
        d = FQ_RNS.lazy_sub(FQ_RNS.mul_lazy(a, b), FQ_RNS.mul_lazy(b, b))
        want.append(np.asarray(FQ_RNS.reduce_d(d)))
    assert (got == np.concatenate(want, -1)).all()


def test_packed_fold_kernel_interpret_parity():
    """fold_buckets_grid_pk (packed kernel, interpret mode) == unpacked fold,
    compared canonically (lazy vs plain reduction give different residue
    representatives of the same values)."""
    from snark_verifier_tpu.ec.rns_g1 import G1R
    from snark_verifier_tpu.msm.pallas_ops import (
        fold_buckets_grid,
        fold_buckets_grid_pk,
    )

    NB, cap = 8, 21
    mat = rand_points(NB * cap).reshape(NB, cap, 3 * SEG)
    ident = jnp.asarray(np.asarray(G1R.infinity()).reshape(-1))
    a = fold_buckets_grid(mat, ident, wb=8, layers=2, interpret=True)
    b = fold_buckets_grid_pk(mat, ident, wb=8, layers=2, interpret=True)
    ca = np.asarray(FQ_RNS.to_limbs(jnp.asarray(a).reshape(NB, 3, SEG)))
    cb = np.asarray(FQ_RNS.to_limbs(jnp.asarray(b).reshape(NB, 3, SEG)))
    assert (ca == cb).all()


def rand_points(n):
    """(n, 3, 35) random projective triples (group law is polynomial —
    equality holds for arbitrary coordinates)."""
    return jnp.stack([rand_elems(n), rand_elems(n), rand_elems(n)], axis=1)


def test_add_packed_matches_curve_add():
    n = 8
    p, q = rand_points(n), rand_points(n)
    want = np.asarray(G1R.add(p, q)).reshape(n, 3 * SEG)
    got = np.asarray(add_packed(FP, FP.pack(p), FP.pack(q)))
    assert (got == want).all()


def test_add_packed_identity_and_doubling_inputs():
    n = 4
    p = rand_points(n)
    inf = jnp.broadcast_to(jnp.asarray(FP.INF_ROW), (n, 3 * SEG))
    got = np.asarray(add_packed(FP, FP.pack(p), inf))
    want = np.asarray(G1R.add(p, G1R.infinity((n,)))).reshape(n, -1)
    assert (got == want).all()
    # P == Q (the complete formula's doubling branch)
    got = np.asarray(add_packed(FP, FP.pack(p), FP.pack(p)))
    want = np.asarray(G1R.add(p, p)).reshape(n, -1)
    assert (got == want).all()


def test_add_packed_on_real_curve_points():
    """Real G1 points: packed chain sum equals the python oracle."""
    from snark_verifier_tpu.ec import py_ec

    from snark_verifier_tpu.ec.rns_g1 import from_rns, to_rns
    from snark_verifier_tpu.ff.spec import int_to_limbs
    from snark_verifier_tpu.ff.jnp_field import get_field

    FQL = get_field(FQ)
    pts_aff = [py_ec.scalar_mul(py_ec.G1_GEN, k + 1) for k in range(4)]
    rows = []
    for x, y in pts_aff:
        rows.append([int_to_limbs(x * (1 << 256) % FQ.p),
                     int_to_limbs(y * (1 << 256) % FQ.p),
                     int_to_limbs(1 * (1 << 256) % FQ.p)])
    pts = to_rns(jnp.asarray(np.asarray(rows, np.uint32)))  # (4, 3, 35)
    packed = FP.pack(pts)
    acc = packed[0]
    for i in range(1, 4):
        acc = add_packed(FP, acc, packed[i])
    out = from_rns(FP.unpack(acc))  # positional (3, 16)
    from snark_verifier_tpu.ec.g1 import G1

    x, y, is_inf = G1.to_affine(out)
    want = py_ec.add(py_ec.add(pts_aff[0], pts_aff[1]),
                     py_ec.add(pts_aff[2], pts_aff[3]))
    xi = FQL.to_int(x) if hasattr(FQL, "to_int") else None
    from snark_verifier_tpu.ff.spec import limbs_to_int

    assert not bool(is_inf)
    assert limbs_to_int(np.asarray(x)) * pow(1 << 256, -1, FQ.p) % FQ.p == want[0]
    assert limbs_to_int(np.asarray(y)) * pow(1 << 256, -1, FQ.p) % FQ.p == want[1]

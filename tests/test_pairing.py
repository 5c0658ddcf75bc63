"""Pairing gates: oracle bilinearity + device == oracle + device pairing
check accepts/rejects (SURVEY.md §7 stage 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ec import py_ec
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.pairing import py_pairing as pp
from snark_verifier_tpu.pairing.pairing import (
    final_exponentiation,
    miller_loop,
    pairing_check,
    prepare_pairs,
)
from snark_verifier_tpu.tower import FQ12, fq12_from_int, fq12_to_int

pytestmark = pytest.mark.slow  # multi-minute tower/pairing compiles; nightly tier


def test_oracle_bilinearity():
    g1, g2 = py_ec.G1_GEN, pp.G2_GEN
    a = 987654321987654321
    assert pp.pairing_check(
        [(py_ec.scalar_mul(g1, a), g2), (py_ec.neg(g1), pp.g2_scalar_mul(g2, a))]
    )
    assert not pp.pairing_check(
        [(py_ec.scalar_mul(g1, a + 1), g2), (py_ec.neg(g1), pp.g2_scalar_mul(g2, a))]
    )


def test_device_miller_matches_oracle():
    g1, g2 = py_ec.G1_GEN, pp.G2_GEN
    p2 = py_ec.scalar_mul(g1, 777)
    q2 = pp.g2_scalar_mul(g2, 31337)
    pairs = [(p2, g2), (g1, q2)]
    want = pp.miller_loop([(p, pp.prepare_g2(q)) for p, q in pairs])
    args = prepare_pairs(pairs)
    import jax
    got = fq12_to_int(jax.jit(miller_loop)(*args))
    assert got == want


def test_device_final_exp_matches_oracle():
    import random

    rng = random.Random(11)
    f = tuple(
        tuple((rng.randrange(pp.P), rng.randrange(pp.P)) for _ in range(3))
        for _ in range(2)
    )
    want = pp.final_exponentiation(f)
    import jax
    got = fq12_to_int(jax.jit(final_exponentiation)(fq12_from_int(f)))
    assert got == want


def test_device_pairing_check():
    g1, g2 = py_ec.G1_GEN, pp.G2_GEN
    a = 123456789123456789
    good = [(py_ec.scalar_mul(g1, a), g2), (py_ec.neg(g1), pp.g2_scalar_mul(g2, a))]
    bad = [(py_ec.scalar_mul(g1, a), g2), (g1, pp.g2_scalar_mul(g2, a))]
    import jax
    pc = jax.jit(pairing_check)
    assert bool(pc(*prepare_pairs(good)))
    assert not bool(pc(*prepare_pairs(bad)))


def test_device_pairing_check_batched():
    """KZG-decide shape: fixed G2 pair (g2, -s_g2), batched G1 inputs."""
    from snark_verifier_tpu.pairing.pairing import prepare_g2_coeffs
    from snark_verifier_tpu.tower.encode import _fq_mont

    g1, g2 = py_ec.G1_GEN, pp.G2_GEN
    s = 55555  # toy trapdoor
    s_g2 = pp.g2_scalar_mul(g2, s)
    dbl, addc, has_add, finals = prepare_g2_coeffs([g2, pp.g2_neg(s_g2)])

    # valid rows: (s*A, A) since e(sA, g2) e(A, -s g2) = 1; one invalid row
    pts = py_ec.rand_points(3, seed=8)
    rows = []
    oks = []
    for i, A in enumerate(pts):
        lhs = py_ec.scalar_mul(A, s)
        if i == 2:
            lhs = py_ec.add(lhs, g1)  # corrupt
        rows.append((lhs, A))
        oks.append(i != 2)
    xs = jnp.asarray(
        np.stack([[_fq_mont(l[0]), _fq_mont(r[0])] for l, r in rows])
    )  # (3, 2, 16)
    ys = jnp.asarray(np.stack([[_fq_mont(l[1]), _fq_mont(r[1])] for l, r in rows]))
    import jax
    out = jax.jit(pairing_check)(xs, ys, dbl, addc, has_add, finals)
    assert [bool(v) for v in out] == oks

"""Native C++ core (csrc/bn254.cpp) vs the python-int oracle."""

import random

import pytest

from snark_verifier_tpu.ec import py_ec
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_native_msm_matches_oracle():
    rng = random.Random(5)
    pts = py_ec.rand_points(16, seed=17)
    ks = [rng.randrange(FR.p) for _ in range(15)] + [0]
    assert native.msm(pts, ks) == py_ec.msm(pts, ks)


def test_native_scalar_mul_edges():
    pt = py_ec.rand_points(1, seed=3)[0]
    for k in [0, 1, 2, FR.p - 1, 123456789]:
        assert native.scalar_mul(pt, k) == py_ec.scalar_mul(pt, k)


def test_native_srs_powers():
    powers = native.srs_powers(py_ec.G1_GEN, 999, 9)
    want = [py_ec.scalar_mul(py_ec.G1_GEN, pow(999, i, FR.p)) for i in range(9)]
    assert powers == want

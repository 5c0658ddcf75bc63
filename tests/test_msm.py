"""Pippenger MSM vs oracle — SURVEY.md §7 stage 2 gate (bit-exact sweep)."""

import random

import jax
import numpy as np
import pytest

from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int
from snark_verifier_tpu.msm import msm, msm_checked, scalars_from_int
from snark_verifier_tpu.parallel import msm_sharded


def _case(n, seed, scalar_fn=None):
    rng = random.Random(seed)
    pts = py_ec.rand_points(n, seed=seed + 1)
    from snark_verifier_tpu.ff.spec import FR

    if scalar_fn is None:
        ks = [rng.randrange(FR.p) for _ in range(n)]
    else:
        ks = [scalar_fn(i, rng) for i in range(n)]
    return pts, ks


@pytest.mark.parametrize("n", [1, 2, 13, 64, 300])
def test_msm_random(n):
    pts, ks = _case(n, seed=n)
    out, ovf = msm(from_affine_int(pts), scalars_from_int(ks))
    assert not bool(ovf)
    assert to_affine_int(out) == py_ec.msm(pts, ks)


def test_msm_edge_scalars():
    pts, _ = _case(8, seed=77)
    from snark_verifier_tpu.ff.spec import FR

    ks = [0, 1, 2, FR.p - 1, 0, 255, 256, 2**253]
    out, ovf = msm(from_affine_int(pts), scalars_from_int(ks))
    assert not bool(ovf)
    assert to_affine_int(out) == py_ec.msm(pts, ks)


def test_msm_duplicate_points_and_scalars():
    # duplicate points with equal digits exercise P==Q inside the tree-fold
    base = py_ec.rand_points(2, seed=5)
    pts = [base[0]] * 4 + [base[1]] * 4
    ks = [3, 3, 3, 3, 7, 7, 7, 7]
    out, ovf = msm(from_affine_int(pts), scalars_from_int(ks))
    assert to_affine_int(out) == py_ec.msm(pts, ks)


def test_msm_overflow_detect_and_retry():
    # 64 identical digits overwhelm a capacity-8 bucket: flag must trip, and
    # msm_checked must still produce the right answer by growing capacity.
    pts, _ = _case(64, seed=9)
    ks = [5] * 64
    dev = from_affine_int(pts)
    sc = scalars_from_int(ks)
    _, ovf = msm(dev, sc, capacity=8)
    assert bool(ovf)
    out = msm_checked(dev, sc, capacity=8)
    assert to_affine_int(out) == py_ec.msm(pts, ks)


def test_msm_sharded_matches_single():
    n = 128
    pts, ks = _case(n, seed=21)
    dev, sc = from_affine_int(pts), scalars_from_int(ks)
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs), ("points",))
    out, ovf = msm_sharded(dev, sc, mesh)
    assert not bool(ovf)
    assert to_affine_int(out) == py_ec.msm(pts, ks)


def test_msm_pallas_fold_interpret_matches():
    """The Pallas fused bucket-fold path (msm/pallas_ops.fold_buckets_chunked
    driven by msm_rns(pallas_fold=True)) is bit-exact vs the python oracle,
    gated in interpret mode (the remote Mosaic service can't compile the
    production shapes — PERFNOTES round-2; the math is target-independent)."""
    from snark_verifier_tpu.msm.pippenger import msm_rns

    n = 512
    pts, ks = _case(8, seed=33)
    pts = [pts[i % 8] for i in range(n)]
    import random

    rng = random.Random(34)
    ks = [rng.randrange(1 << 254) for _ in range(n)]
    out, ovf = msm_rns(
        from_affine_int(pts), scalars_from_int(ks), capacity=60,
        pallas_fold=True, interpret=True,
    )
    assert not bool(ovf)
    assert to_affine_int(out) == py_ec.msm(pts, ks)

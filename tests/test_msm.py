"""Pippenger MSM vs oracle — SURVEY.md §7 stage 2 gate (bit-exact sweep)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int
from snark_verifier_tpu.msm import msm, msm_checked, scalars_from_int
from snark_verifier_tpu.parallel import msm_sharded

pytestmark = pytest.mark.slow  # multi-minute Pippenger/Pallas compiles; nightly tier


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
    """The production Pallas bucket fold (msm/pallas_ops.fold_buckets_grid,
    default on TPU) is bit-exact vs the python oracle, gated in interpret
    mode (the math is target-independent; on-chip bit-exactness is gated by
    bench.py's generator-multiple self-check every run)."""
    import numpy as np_

    from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns
    from snark_verifier_tpu.msm.pallas_ops import fold_buckets_grid

    base = py_ec.rand_points(4, seed=33)
    rng = np_.random.default_rng(34)
    NB, cap = 6, 44
    pick = rng.integers(0, 5, size=(NB, cap))  # 4 = empty slot
    g_rows = np_.asarray(to_rns(from_affine_int(base))).reshape(4, -1)
    inf_row = np_.asarray(G1R.infinity()).reshape(-1)
    rows = np_.concatenate([g_rows, inf_row[None]], 0)
    mat = jnp.asarray(rows[pick].astype(np_.uint16))
    out = fold_buckets_grid(mat, jnp.asarray(inf_row), wb=16, layers=3,
                            interpret=True)
    for i in range(NB):
        want = None
        for j in range(cap):
            if pick[i, j] < 4:
                want = py_ec.add(want, base[pick[i, j]])
        got = to_affine_int(from_rns(out[i].reshape(3, 35)))
        assert got == want


def test_msm_host_slot_indices_match_device():
    """The C++ host slot assignment (csrc bn254_slot_indices — the
    production prep for the Pallas path) is bit-identical to the device
    _slot_indices module."""
    import numpy as np_

    from snark_verifier_tpu.msm.pippenger import (
        _slot_indices,
        default_capacity,
        extract_digits,
        top_capacity,
        top_range,
    )
    from snark_verifier_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native core unavailable")
    import random

    from snark_verifier_tpu.ff.spec import FR, int_to_limbs

    rng = random.Random(5)
    n, c = 1024, 8
    ks = [rng.randrange(FR.p) for _ in range(n)]
    sc16 = np_.stack([int_to_limbs(k) for k in ks])
    cap = default_capacity(n, 1 << c)
    trange, tcap = top_range(c), max(cap, top_capacity(n, c))
    sc = sc16.astype(np_.uint64)
    packed = (sc[:, 0::4] | (sc[:, 1::4] << np_.uint64(16))
              | (sc[:, 2::4] << np_.uint64(32)) | (sc[:, 3::4] << np_.uint64(48)))
    im, it, ovf = native.slot_indices(packed, c, cap, trange, tcap)
    digits = extract_digits(jnp.asarray(sc16), c)
    idx_dev, ovf_dev = _slot_indices(digits[:-1], 1 << c, cap)
    top_dev, tovf_dev = _slot_indices(digits[-1:], trange, tcap)
    assert np_.array_equal(np_.asarray(idx_dev), im)
    assert np_.array_equal(np_.asarray(top_dev[0]), it)
    assert ovf == bool(ovf_dev | tovf_dev)

"""Transcript equivalence: device transcript vs python-int oracle, including
point absorption (fe_to_fe semantics: coordinates reduced mod r)."""

import jax.numpy as jnp

from snark_verifier_tpu.ec import from_affine_int, py_ec
from snark_verifier_tpu.ff import FR, FR_FIELD
from snark_verifier_tpu.transcript import (
    PoseidonTranscript,
    PoseidonTranscriptPy,
    fq_to_fr,
)


def test_fq_to_fr_reduces_mod_r():
    from snark_verifier_tpu.ff import FQ, FQ_FIELD

    big = FQ.p - 1  # exceeds r
    x = FQ_FIELD.from_int(big)
    got = int(FR_FIELD.to_int(fq_to_fr(x)))
    assert got == big % FR.p


def test_transcript_challenges_match_oracle():
    pts = py_ec.rand_points(3, seed=42)
    scalars = [123456789, FR.p - 1, 7]

    # oracle
    tp = PoseidonTranscriptPy(scalars=scalars, points=pts)
    tp.common_scalar(999)
    c0 = tp.squeeze_challenge()
    tp.read_scalar()
    tp.read_ec_point()
    c1 = tp.squeeze_challenge()
    tp.read_ec_point()
    tp.read_scalar()
    tp.read_ec_point()
    tp.read_scalar()
    c2 = tp.squeeze_challenge()

    # device: pre-parsed streams
    sc = jnp.stack([FR_FIELD.from_int(s) for s in scalars], 0)
    pt = from_affine_int(pts)[:, :2, :]  # affine (x, y)
    td = PoseidonTranscript(scalars=sc, points=pt)
    td.common_scalar(FR_FIELD.from_int(999))
    d0 = int(FR_FIELD.to_int(td.squeeze_challenge()))
    td.read_scalar()
    td.read_ec_point()
    d1 = int(FR_FIELD.to_int(td.squeeze_challenge()))
    td.read_ec_point()
    td.read_scalar()
    td.read_ec_point()
    td.read_scalar()
    d2 = int(FR_FIELD.to_int(td.squeeze_challenge()))

    assert (d0, d1, d2) == (c0, c1, c2)


def test_transcript_batched():
    """Two identical proof streams in a batch give identical challenges."""
    pts = py_ec.rand_points(2, seed=1)
    sc_vals = [11, 22]
    tp = PoseidonTranscriptPy(scalars=sc_vals, points=pts)
    tp.read_scalar()
    tp.read_ec_point()
    want = tp.squeeze_challenge()

    sc1 = jnp.stack([FR_FIELD.from_int(s) for s in sc_vals], 0)
    pt1 = from_affine_int(pts)[:, :2, :]
    sc = jnp.stack([sc1, sc1], 0)  # (2, n, 16)
    pt = jnp.stack([pt1, pt1], 0)  # (2, n, 2, 16)
    td = PoseidonTranscript(scalars=sc, points=pt, batch_shape=(2,))
    td.read_scalar()
    td.read_ec_point()
    out = FR_FIELD.to_int(td.squeeze_challenge())
    assert [int(v) for v in out] == [want, want]

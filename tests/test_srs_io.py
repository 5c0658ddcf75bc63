"""halo2 ParamsKZG ('Processed' layout) SRS file round-trip: compressed G1
powers + Lagrange commitments + compressed G2 pair, with on-curve validation
on load (reference file caching: snark-verifier-sdk/src/lib.rs:79-131)."""

import os

import pytest

from snark_verifier_tpu import errors
from snark_verifier_tpu.ec import py_ec
from snark_verifier_tpu.pairing import py_pairing as pp
from snark_verifier_tpu.sdk.srs import (
    Srs,
    _g2_to_bytes,
    g2_from_bytes,
    load_params,
    save_params,
    toy_srs,
)


def test_g2_roundtrip():
    g2 = pp.G2_GEN
    assert g2_from_bytes(_g2_to_bytes(g2)) == g2
    neg = pp.g2_neg(g2)
    assert g2_from_bytes(_g2_to_bytes(neg)) == neg
    assert g2_from_bytes(bytes(64)) is None
    for k in (3, 7, 1 << 100):
        pt = pp.g2_scalar_mul(pp.G2_GEN, k)
        assert g2_from_bytes(_g2_to_bytes(pt)) == pt


def test_g2_invalid_rejected():
    bad = bytearray(_g2_to_bytes(pp.G2_GEN))
    bad[0] ^= 2  # tweak x off the twist curve (x+2 almost surely off)
    with pytest.raises(errors.TranscriptError):
        g2_from_bytes(bytes(bad))


def test_params_file_roundtrip(tmp_path):
    srs = toy_srs(16, seed=0xFEED)
    path = str(tmp_path / "params_k4.srs")
    save_params(srs, path)
    assert os.path.getsize(path) == 4 + 2 * 16 * 32 + 2 * 64
    again = load_params(path)
    assert again.g1_powers == srs.g1_powers
    assert again.g2 == srs.g2 and again.s_g2 == srs.s_g2
    assert again.g_lagrange() == srs.g_lagrange()
    assert again.content_hash() == srs.content_hash()


def test_lagrange_commitments_interpolate():
    """Sum of Lagrange commitments = commitment of the all-ones eval vector
    = [sum L_i(tau)]G = [1]G (since sum L_i = 1)."""
    srs = toy_srs(8, seed=0xBEEF)
    acc = None
    for pt in srs.g_lagrange():
        acc = py_ec.add(acc, pt)
    assert acc == py_ec.G1_GEN

"""Deserialization-time proof validation (reference parity:
`validate_ec_point` in /root/reference/snark-verifier/src/loader/evm/code.rs:41-55
and halo2curves `from_xy` checks on the native path): off-curve or unreduced
proof data must be rejected with a typed error before any device math."""

import pytest

from snark_verifier_tpu import errors
from snark_verifier_tpu.ff.spec import FQ, FR
from snark_verifier_tpu.pcs.kzg.accumulator import (
    accumulator_from_limbs_int,
    accumulator_to_limbs_int,
)
from snark_verifier_tpu.sdk.snark import gen_dummy_snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol


def _snark():
    srs = toy_srs(32)
    protocol = build_protocol(StandardPlonk.rand(k=3, seed=7), srs)
    return gen_dummy_snark(protocol, "shplonk", seed=7)


def test_valid_dummy_passes():
    _snark().validate()


def test_off_curve_point_rejected():
    s = _snark()
    x, y = s.points[1]
    s.points[1] = (x, (y + 1) % FQ.p)
    with pytest.raises(errors.TranscriptError, match="not on curve"):
        s.validate()
    with pytest.raises(errors.TranscriptError):
        s.device_streams()  # the verify-path ingestion boundary


def test_unreduced_coordinate_rejected():
    s = _snark()
    x, y = s.points[0]
    s.points[0] = (x + FQ.p, y)  # same point mod p, non-canonical encoding
    with pytest.raises(errors.TranscriptError, match="not reduced"):
        s.validate()


def test_unreduced_scalar_rejected():
    s = _snark()
    s.scalars[0] = FR.p
    with pytest.raises(errors.TranscriptError, match="not reduced"):
        s.validate()


def test_wrong_instance_count_rejected():
    s = _snark()
    s.instances[0].append(1)
    with pytest.raises(errors.InvalidInstances):
        s.validate()


def test_accumulator_limbs_roundtrip_and_validation():
    from snark_verifier_tpu.ec import py_ec

    pts = py_ec.rand_points(2, seed=9)
    acc = (pts[0], pts[1])
    limbs = accumulator_to_limbs_int(acc)
    assert accumulator_from_limbs_int(limbs) == acc

    s = _snark()
    s.protocol.accumulator_indices = [[(0, i) for i in range(12)]]
    s.instances[0] = limbs  # valid encoding
    s.protocol.num_instance = [12]
    s.validate()
    s.instances[0] = [l ^ 1 for l in limbs]  # corrupt -> off-curve decode
    with pytest.raises(errors.InvalidInstances, match="off-curve"):
        s.validate()

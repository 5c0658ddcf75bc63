"""Byte codec tests: halo2curves-compatible compressed points, 32-byte LE
scalars, EVM big-endian words, and full proof round-trips in both formats
(reference wire formats: system/halo2/transcript/halo2.rs:229-262 native,
transcript/evm.rs:205-230 EVM)."""

import pytest

from snark_verifier_tpu import errors
from snark_verifier_tpu.ec import py_ec
from snark_verifier_tpu.ff.spec import FQ, FR
from snark_verifier_tpu.sdk import proof_io as pio
from snark_verifier_tpu.sdk.snark import gen_dummy_snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol


def test_generator_compressed_kat():
    # G = (1, 2): y even -> sign 0 -> bytes = LE(1)
    b = pio.g1_to_bytes((1, 2))
    assert b == b"\x01" + bytes(31)
    assert pio.g1_from_bytes(b) == (1, 2)
    # -G = (1, q-2): y odd -> top bit set
    neg = pio.g1_to_bytes((1, FQ.p - 2))
    assert neg[31] == 0x80 and neg[0] == 1
    assert pio.g1_from_bytes(neg) == (1, FQ.p - 2)


def test_identity_and_roundtrip():
    assert pio.g1_to_bytes(None) == bytes(32)
    assert pio.g1_from_bytes(bytes(32)) is None
    for pt in py_ec.rand_points(20, seed=4):
        assert pio.g1_from_bytes(pio.g1_to_bytes(pt)) == pt
        assert pio.g1_from_bytes_evm(pio.g1_to_bytes_evm(pt)) == pt


def test_invalid_encodings_rejected():
    with pytest.raises(errors.TranscriptError):
        pio.fq_from_bytes(int(FQ.p).to_bytes(32, "little"))
    with pytest.raises(errors.TranscriptError):
        pio.fr_from_bytes(int(FR.p).to_bytes(32, "little"))
    # x with no sqrt for x^3+3
    for x in range(2, 50):
        y2 = (x**3 + 3) % FQ.p
        if pow(y2, (FQ.p - 1) // 2, FQ.p) != 1:
            with pytest.raises(errors.TranscriptError):
                pio.g1_from_bytes(int(x).to_bytes(32, "little"))
            break
    else:
        pytest.fail("no non-residue x found")
    # off-curve EVM point
    pt = py_ec.rand_points(1, seed=5)[0]
    bad = pio.g1_to_bytes_evm((pt[0], (pt[1] + 1) % FQ.p))
    with pytest.raises(errors.TranscriptError):
        pio.g1_from_bytes_evm(bad)


@pytest.mark.parametrize("scheme", ["shplonk", "gwc"])
@pytest.mark.parametrize("fmt", ["poseidon", "evm"])
def test_proof_roundtrip(scheme, fmt):
    srs = toy_srs(32)
    protocol = build_protocol(StandardPlonk.rand(k=3, seed=13), srs)
    snark = gen_dummy_snark(protocol, scheme, seed=13)
    data = pio.proof_to_bytes(snark, scheme, fmt)
    pt_size = 32 if fmt == "poseidon" else 64
    assert len(data) == len(snark.scalars) * 32 + len(snark.points) * pt_size
    again = pio.proof_from_bytes(protocol, snark.instances, data, scheme, fmt)
    assert again.scalars == snark.scalars
    assert again.points == snark.points

    # corrupt a scalar's most-significant byte -> unreduced -> typed rejection
    # (a 1-bit x flip can land on another valid point, as with the reference
    # format; range checks are the guaranteed detection)
    corrupted = bytearray(data)
    pre, _ = pio._point_split(protocol, scheme)
    off = pre * pt_size + (31 if fmt == "poseidon" else 0)
    corrupted[off] = 0xFF
    with pytest.raises(errors.TranscriptError):
        pio.proof_from_bytes(protocol, snark.instances, bytes(corrupted), scheme, fmt)

    # truncated stream
    with pytest.raises(errors.TranscriptError):
        pio.proof_from_bytes(protocol, snark.instances, data[:-1], scheme, fmt)

"""Bincode protocol/Snark codec + halo2 vk-digest pipeline (INTEROP.md;
reference halo2.rs:228 snark files, lib.rs:133-159 instance files,
system/halo2.rs:686-722 transcript_initial_state)."""

import hashlib

import pytest

from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.sdk.bincode_io import (
    Reader,
    read_instances,
    read_protocol,
    read_snark,
    write_instances,
    write_protocol,
    write_snark,
)
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, gen_snark
from snark_verifier_tpu.system.vk_digest import (
    PERSONALIZATION,
    fmt_point,
    fr_from_bytes_wide,
    pinned_cs_string,
    pinned_vk_string,
    transcript_repr,
)


@pytest.fixture(scope="module")
def setup():
    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=21)
    protocol = build_protocol(circuit, srs)
    snark = gen_snark(circuit, protocol, srs, scheme="shplonk")
    return srs, circuit, protocol, snark


# ------------------------------------------------------------ bincode layer


def test_bincode_primitives():
    r = Reader(bytes.fromhex("03000000000000000102030100") )
    assert r.vec(r.u8) == [1, 2, 3]
    assert r.option(r.u8) == 0x00
    r.done()
    # Option None + u32 enum tag
    r2 = Reader(bytes.fromhex("0002000000"))
    assert r2.option(r2.u8) is None
    assert r2.u32() == 2
    r2.done()


@pytest.mark.parametrize("codec", ["mont", "canonical"])
def test_protocol_roundtrip(setup, codec):
    _, _, protocol, _ = setup
    blob = write_protocol(protocol, fe_codec=codec)
    again = read_protocol(blob, fe_codec=codec)
    assert again.content_hash() == protocol.content_hash()


def test_protocol_roundtrip_with_linearization_and_accumulators(setup):
    import copy

    _, _, protocol, _ = setup
    p = copy.deepcopy(protocol)
    p.linearization = "MinusVanishingTimesQuotient"
    p.accumulator_indices = [[(0, i) for i in range(12)]]
    again = read_protocol(write_protocol(p))
    assert again.linearization == p.linearization
    assert again.accumulator_indices == p.accumulator_indices


def test_mont_and_canonical_differ(setup):
    """The two fe codecs must actually produce different bytes (guards
    against one silently aliasing the other)."""
    _, _, protocol, _ = setup
    assert write_protocol(protocol, "mont") != write_protocol(protocol, "canonical")


def test_instances_roundtrip():
    cols = [[1, 2, FR.p - 1], [], [12345678901234567890 % FR.p]]
    assert read_instances(write_instances(cols)) == cols


def test_instances_reject_noncanonical():
    blob = bytearray(write_instances([[1]]))
    blob[-32:] = FR.p.to_bytes(32, "little")  # == modulus: not canonical
    with pytest.raises(ValueError, match="non-canonical"):
        read_instances(bytes(blob))


def test_snark_roundtrip_and_verify(setup):
    from snark_verifier_tpu.verifier.plonk.verifier import verify_snark_native

    srs, _, protocol, snark = setup
    blob = write_snark(snark, scheme="shplonk")
    again = read_snark(blob, scheme="shplonk")
    assert again.protocol.content_hash() == protocol.content_hash()
    assert again.instances == snark.instances
    assert again.scalars == snark.scalars
    assert again.points == snark.points
    assert verify_snark_native(again, srs, "shplonk")


def test_snark_reject_offcurve_point(setup):
    from snark_verifier_tpu import errors

    _, _, _, snark = setup
    blob = bytearray(write_snark(snark))
    # first preprocessed point starts after Domain (2 usize + 3 Fr = 112
    # bytes) + the Vec length prefix (8)
    off = 112 + 8
    blob[off : off + 32] = (7).to_bytes(32, "little")
    with pytest.raises(Exception):
        read_snark(bytes(blob))


# ------------------------------------------------------------- vk digest


def test_fr_from_bytes_wide():
    b = bytes(range(64))
    assert fr_from_bytes_wide(b) == int.from_bytes(b, "little") % FR.p


def test_transcript_repr_pipeline():
    """Independent recomputation of the digest mechanics: blake2b-512 with
    the Halo2-Verify-Key personalization over the u64-le length-prefixed
    pinned string, reduced 512-bit little-endian mod r."""
    s = "PinnedVerificationKey { test: 1 }"
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    h.update(len(s.encode()).to_bytes(8, "little"))
    h.update(s.encode())
    want = int.from_bytes(h.digest(), "little") % FR.p
    assert transcript_repr(s) == want
    assert PERSONALIZATION == b"Halo2-Verify-Key"
    # length prefix matters: a different-length string with same content
    # prefix must hash differently
    assert transcript_repr(s + " ") != transcript_repr(s)


def test_pinned_vk_string_grammar(setup):
    _, _, protocol, _ = setup
    cs = pinned_cs_string(
        num_fixed_columns=6, num_advice_columns=3, num_instance_columns=1,
        gates=["Product(Fixed, Advice)"],
    )
    s = pinned_vk_string(
        k=3, extended_k=5, omega=protocol.domain.gen,
        cs_debug=cs,
        fixed_commitments=protocol.preprocessed,
        permutation_commitments=[],
    )
    # outer grammar smoke checks (rust derive-Debug shape)
    assert s.startswith("PinnedVerificationKey { base_modulus: \"0x")
    assert "PinnedEvaluationDomain { k: 3, extended_k: 5, omega: 0x" in s
    assert "minimum_degree: None" in s
    assert fmt_point(protocol.preprocessed[0]) in s
    # digest is a valid scalar and deterministic
    d = transcript_repr(s)
    assert 0 <= d < FR.p and d == transcript_repr(s)

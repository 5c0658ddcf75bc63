"""Byte-level proof codecs — the wire formats the reference consumes/emits.

Two formats, matching the reference's two native transcripts:

* "poseidon" (halo2curves-native): scalars are 32-byte little-endian reduced
  Fr; points are 32-byte compressed G1 — x as LE bytes with the parity of
  canonical y in bit 7 of byte 31, identity encoded as all-zero (halo2curves
  `new_curve_impl` GroupEncoding; consumed by the reference's
  PoseidonTranscript `read_scalar`/`read_ec_point`,
  /root/reference/snark-verifier/src/system/halo2/transcript/halo2.rs:229-262).
* "evm": 32-byte big-endian words, points as uncompressed x ‖ y (0x40 bytes,
  transcript/evm.rs:205-230).

The byte stream interleaves values in transcript-read order, which for every
protocol/scheme is three contiguous runs: [witness+quotient points]
[evaluation scalars] [PCS proof points] (verifier/plonk/proof.rs:52-153 —
GWC and SHPLONK PCS proofs are point-only).  proof_to_bytes/proof_from_bytes
round-trip a Snark through that layout; decoding validates every field
element is reduced and every point decompresses onto the curve (raising
errors.TranscriptError like the reference's `from_repr`/`from_bytes` checks).
"""

from __future__ import annotations

from typing import List, Tuple

from .. import errors
from ..ff.spec import FQ, FR
from ..verifier.plonk.protocol import PlonkProtocol

Q = FQ.p
R = FR.p


# --------------------------------------------------------------- field codec


def fr_to_bytes(v: int) -> bytes:
    assert 0 <= v < R
    return int(v).to_bytes(32, "little")


def fr_from_bytes(b: bytes) -> int:
    v = int.from_bytes(b, "little")
    if v >= R:
        raise errors.TranscriptError("Invalid scalar encoding in proof")
    return v


def fq_to_bytes(v: int) -> bytes:
    assert 0 <= v < Q
    return int(v).to_bytes(32, "little")


def fq_from_bytes(b: bytes) -> int:
    v = int.from_bytes(b, "little")
    if v >= Q:
        raise errors.TranscriptError("Invalid coordinate encoding in proof")
    return v


# --------------------------------------------------------------- point codec


def g1_to_bytes(pt) -> bytes:
    """Compressed halo2curves encoding: x LE with y-parity in bit 7 of byte
    31; identity = 32 zero bytes."""
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(fq_to_bytes(x))
    b[31] |= (y & 1) << 7
    return bytes(b)


def g1_from_bytes(b: bytes):
    """Decompress + on-curve validation."""
    raw = bytearray(b)
    ysign = raw[31] >> 7
    raw[31] &= 0x7F
    x = fq_from_bytes(bytes(raw))
    if x == 0 and not ysign:
        return None  # identity
    y2 = (x * x * x + 3) % Q
    y = pow(y2, (Q + 1) // 4, Q)  # q = 3 mod 4
    if y * y % Q != y2:
        raise errors.TranscriptError("point not on curve (no sqrt)")
    if (y & 1) != ysign:
        y = Q - y
    return (x, y)


def g1_to_bytes_evm(pt) -> bytes:
    if pt is None:
        raise errors.TranscriptError("identity not representable in EVM words")
    x, y = pt
    return int(x).to_bytes(32, "big") + int(y).to_bytes(32, "big")


def g1_from_bytes_evm(b: bytes):
    x = int.from_bytes(b[:32], "big")
    y = int.from_bytes(b[32:64], "big")
    if x >= Q or y >= Q:
        raise errors.TranscriptError("Invalid coordinate encoding in proof")
    if (y * y - (x * x * x + 3)) % Q != 0:
        raise errors.TranscriptError("point not on curve")
    return (x, y)


# --------------------------------------------------------------- proof codec


def _point_split(protocol: PlonkProtocol, scheme_name: str) -> Tuple[int, int]:
    """(#points read before the evaluations, #points read after) in the
    transcript order of PlonkProof.read."""
    from .snark import proof_shape

    pre = sum(protocol.num_witness) + protocol.quotient.num_chunk()
    _, total = proof_shape(protocol, scheme_name)
    return pre, total - pre


def proof_to_bytes(snark, scheme_name: str = "shplonk", fmt: str = "poseidon") -> bytes:
    """Snark streams -> transcript-ordered proof bytes."""
    pre, post = _point_split(snark.protocol, scheme_name)
    assert len(snark.points) == pre + post, "stream shape mismatch"
    enc_pt = g1_to_bytes if fmt == "poseidon" else g1_to_bytes_evm
    enc_fr = (
        fr_to_bytes if fmt == "poseidon" else (lambda v: int(v).to_bytes(32, "big"))
    )
    out = bytearray()
    for pt in snark.points[:pre]:
        out += enc_pt(pt)
    for s in snark.scalars:
        out += enc_fr(s)
    for pt in snark.points[pre:]:
        out += enc_pt(pt)
    return bytes(out)


def proof_from_bytes(protocol: PlonkProtocol, instances: List[List[int]],
                     data: bytes, scheme_name: str = "shplonk",
                     fmt: str = "poseidon"):
    """Transcript-ordered proof bytes -> validated Snark."""
    from .snark import Snark, proof_shape

    n_scalars, _ = proof_shape(protocol, scheme_name)
    pre, post = _point_split(protocol, scheme_name)
    pt_size = 32 if fmt == "poseidon" else 64
    want = (pre + post) * pt_size + n_scalars * 32
    if len(data) != want:
        raise errors.TranscriptError(f"proof length {len(data)} != {want}")
    dec_pt = g1_from_bytes if fmt == "poseidon" else g1_from_bytes_evm
    dec_fr = (
        fr_from_bytes
        if fmt == "poseidon"
        else (lambda b: fr_from_bytes(bytes(reversed(b))))
    )
    pos = 0
    points, scalars = [], []
    for _ in range(pre):
        points.append(dec_pt(data[pos : pos + pt_size]))
        pos += pt_size
    for _ in range(n_scalars):
        scalars.append(dec_fr(data[pos : pos + 32]))
        pos += 32
    for _ in range(post):
        points.append(dec_pt(data[pos : pos + pt_size]))
        pos += pt_size
    return Snark(
        protocol=protocol, instances=instances, scalars=scalars, points=points
    ).validate()

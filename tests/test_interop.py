"""Interop hardening: independently-derived second witnesses for the pieces
that define wire compatibility with the reference toolchain (no cargo in
this image, so the demand is executable cross-checks, not cross-builds):

1. The OPTIMIZED sparse-MDS Poseidon (poseidon.rs:168-316) implemented as a
   second path, asserted challenge-equal to the production vanilla rounds.
2. Hand-computed halo2curves compressed-point KATs for nontrivial points
   (2G, 5G), with the group law re-derived inline from the chord/tangent
   formulas — independent of ec/py_ec.
3. A protocol-JSON import test written directly from the reference's serde
   field names (verifier/plonk/protocol.rs:20-63) rather than from our own
   to_json output.
"""

import random

import pytest

from snark_verifier_tpu.ff.spec import FQ, FR
from snark_verifier_tpu.hash.poseidon import PoseidonPy
from snark_verifier_tpu.hash.poseidon_optimized import PoseidonOptimizedPy

Q = FQ.p
R = FR.p


# ------------------------------------------------- 1. optimized Poseidon


def test_optimized_poseidon_matches_vanilla_random_transcripts():
    rng = random.Random(42)
    a, b = PoseidonPy(), PoseidonOptimizedPy()
    for _ in range(30):
        vals = [rng.randrange(R) for _ in range(rng.randrange(0, 7))]
        a.update(vals)
        b.update(vals)
        assert a.squeeze() == b.squeeze()


def test_optimized_poseidon_empty_and_exact_rate():
    # the exact-multiple extra permutation (poseidon.rs:449-467)
    for seq in ([], [1, 2], [1, 2, 3, 4], [0]):
        a, b = PoseidonPy(), PoseidonOptimizedPy()
        a.update(seq)
        b.update(seq)
        assert a.squeeze() == b.squeeze()


def test_optimized_poseidon_state_chaining():
    # challenges interleaved with absorbs must stay in lockstep (transcript
    # usage pattern: common / squeeze / common / squeeze ...)
    a, b = PoseidonPy(), PoseidonOptimizedPy()
    for i in range(5):
        a.update([i])
        b.update([i])
        assert a.squeeze() == b.squeeze()


# ---------------------------------------- 2. compressed point KATs (2G, 5G)


def _double_affine(p):
    """Chord/tangent doubling, derived inline (independent of py_ec)."""
    x, y = p
    lam = 3 * x * x * pow(2 * y, -1, Q) % Q
    x3 = (lam * lam - 2 * x) % Q
    return (x3, (lam * (x - x3) - y) % Q)


def _add_affine(p, q):
    if p == q:
        return _double_affine(p)
    (x1, y1), (x2, y2) = p, q
    lam = (y2 - y1) * pow(x2 - x1, -1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    return (x3, (lam * (x1 - x3) - y1) % Q)


G = (1, 2)
G2_KAT = (
    1368015179489954701390400359078579693043519447331113978918064868415326638035,
    9918110051302171585080402603319702774565515993150576347155970296011118125764,
)
G5_KAT = (
    10744596414106452074759370245733544594153395043370666422502510773307029471145,
    848677436511517736191562425154572367705380862894644942948681172815252343932,
)
ENC_G = "0100000000000000000000000000000000000000000000000000000000000000"
ENC_2G = "d3cf876dc108c2d3a81c8716a91678d9851518685b04859b021a132ee7440603"
ENC_5G = "a93f16faa7a849e89ca35389d8dee46243772b760402bc66f7e0fe0edf39c117"


def test_point_kats_group_law():
    from snark_verifier_tpu.ec import py_ec

    g2 = _double_affine(G)
    g5 = _add_affine(_double_affine(g2), G)
    assert g2 == G2_KAT and g5 == G5_KAT
    # py_ec (a separate complete-formula implementation) must agree
    assert py_ec.double(G) == G2_KAT
    assert py_ec.scalar_mul(G, 5) == G5_KAT
    # curve membership from first principles
    for x, y in (g2, g5):
        assert (y * y - x * x * x - 3) % Q == 0


def test_point_kats_compressed_encoding():
    from snark_verifier_tpu.sdk.proof_io import g1_from_bytes, g1_to_bytes

    for pt, enc in ((G, ENC_G), (G2_KAT, ENC_2G), (G5_KAT, ENC_5G)):
        # encoding = x little-endian with odd(y) in bit 7 of byte 31
        # (halo2curves new_curve_impl GroupEncoding)
        manual = bytearray(int(pt[0]).to_bytes(32, "little"))
        manual[31] |= (pt[1] & 1) << 7
        assert bytes(manual).hex() == enc
        assert g1_to_bytes(pt).hex() == enc
        assert g1_from_bytes(bytes.fromhex(enc)) == pt


def test_point_identity_encoding():
    from snark_verifier_tpu.sdk.proof_io import g1_from_bytes, g1_to_bytes

    assert g1_to_bytes(None) == bytes(32)
    assert g1_from_bytes(bytes(32)) is None


# ------------------------------------ 3. protocol JSON from serde field names


def test_protocol_import_from_reference_field_names():
    """JSON written by hand from protocol.rs:20-63 field names and the
    Expression enum tags (:309-318), NOT from our own serializer."""
    from snark_verifier_tpu.verifier.plonk.protocol import PlonkProtocol

    doc = {
        # Domain (arithmetic.rs:131-162): k and the 2^k-th root of unity
        "domain": {"k": 2, "n": 4, "n_inv": hex(pow(4, -1, R)),
                   "gen": hex(pow(7, (R - 1) >> 2, R)),
                   "gen_inv": hex(pow(pow(7, (R - 1) >> 2, R), -1, R))},
        "preprocessed": [[hex(G2_KAT[0]), hex(G2_KAT[1])]],
        "num_instance": [1],
        "num_witness": [2],
        "num_challenge": [0],
        "evaluations": [{"poly": 0, "rotation": 0}],
        "queries": [{"poly": 0, "rotation": 0}, {"poly": 3, "rotation": 0}],
        "quotient": {
            "chunk_degree": 1,
            # serde enum tags exactly as the reference derives them
            # (Expression enum, protocol.rs:309-318)
            "numerator": {
                "Product": [
                    {"Polynomial": {"poly": 0, "rotation": 0}},
                    {"Sum": [
                        {"Polynomial": {"poly": 3, "rotation": 0}},
                        {"Constant": hex(5)},
                    ]},
                ],
            },
        },
        "transcript_initial_state": hex(123),
        "instance_committing_key": None,
        "linearization": None,
        "accumulator_indices": [[[0, j] for j in range(12)]],
    }
    p = PlonkProtocol.from_json(doc)
    assert p.domain.n == 4 and p.domain.k == 2
    assert p.preprocessed == [G2_KAT]
    assert p.num_instance == [1] and p.num_witness == [2]
    assert p.quotient.num_chunk() == 1
    assert p.transcript_initial_state == 123
    assert p.accumulator_indices == [[(0, j) for j in range(12)]]
    # round-trips losslessly
    again = PlonkProtocol.from_json(p.to_json())
    assert again.to_json() == p.to_json()


def test_expression_tags_cover_reference_enum():
    """Every reference Expression variant (protocol.rs:309-318) has a tag in
    our AST: Constant, CommonPolynomial, Polynomial, Challenge, Negated,
    Sum, Product, Scaled, DistributePowers."""
    from snark_verifier_tpu.verifier.plonk.protocol import Expression, Query

    e = Expression
    q = Query(1, 0)
    exprs = [
        e.constant(7),
        e.common(("lagrange", 3)),
        e.common(("identity",)),
        e.poly(q),
        e.challenge(2),
        -e.poly(q),
        e.poly(q) + e.constant(1),
        e.poly(q) * e.poly(q),
        e.poly(q) * 5,
        e.distribute_powers([e.poly(q), e.constant(2)], e.challenge(0)),
    ]
    for x in exprs:
        again = e.from_json(x.to_json())
        assert again.to_json() == x.to_json()

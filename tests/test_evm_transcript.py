"""Keccak/EVM transcript path: keccak KATs + full PLONK round-trip with the
EVM transcript (host keccak Fiat-Shamir, device math via challenge replay)."""

import jax
import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ec import from_affine_int
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.hash.keccak import keccak256
from snark_verifier_tpu.pcs.kzg.decider import decide_all
from snark_verifier_tpu.pcs.kzg.multiopen import Bdfg21
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, prove
from snark_verifier_tpu.transcript import EvmTranscriptPy, PrecomputedChallengeTranscript
from snark_verifier_tpu.verifier.plonk.verifier import PlonkSuccinctVerifier


def test_keccak256_kats():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block (> 136-byte rate)
    assert (
        keccak256(b"a" * 200).hex()
        == keccak256(b"a" * 100 + b"a" * 100).hex()
    )


def test_evm_transcript_squeeze_semantics():
    t = EvmTranscriptPy()
    t.common_scalar(5)
    t.common_scalar(7)
    c1 = t.squeeze_challenge()  # 64-byte buffer: no 0x01 pad
    c2 = t.squeeze_challenge()  # 32-byte (hash) buffer: 0x01 pad applies
    h1 = keccak256((5).to_bytes(32, "big") + (7).to_bytes(32, "big"))
    assert c1 == int.from_bytes(h1, "big") % FR.p
    h2 = keccak256(h1 + b"\x01")
    assert c2 == int.from_bytes(h2, "big") % FR.p


@pytest.mark.slow
def test_plonk_e2e_with_evm_transcript():
    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=11)
    protocol = build_protocol(circuit, srs)
    t = EvmTranscriptPy()
    scalars, points = prove(circuit, protocol, srs, scheme="shplonk", transcript=t)

    # verifier host half: replay the keccak transcript to recompute challenges
    tv = EvmTranscriptPy(scalars=scalars, points=points)
    if protocol.transcript_initial_state is not None:
        tv.common_scalar(protocol.transcript_initial_state)
    for v in circuit.instance:
        tv.common_scalar(v)
    for _ in range(3):  # witnesses
        tv.read_ec_point()
    for _ in range(protocol.quotient.num_chunk()):
        tv.read_ec_point()
    tv.squeeze_challenge()  # z
    for _ in range(len(protocol.evaluations)):
        tv.read_scalar()
    tv.squeeze_challenge()  # mu
    tv.squeeze_challenge()  # gamma
    tv.read_ec_point()  # W
    tv.squeeze_challenge()  # z'
    tv.read_ec_point()  # W'
    assert tv.challenges == t.challenges  # prover/verifier replay agree

    # device half with precomputed challenges.  The whole read+verify+decide
    # is ONE jitted function with the challenge sequence as a traced array:
    # eager verification dispatches hundreds of tiny compiles, which both
    # crawls and (observed) can segfault XLA:CPU mid-suite.
    sc = jnp.stack([FR_FIELD.from_int(s) for s in scalars], 0)
    pts = from_affine_int(points)[:, :2, :]
    instances = [[FR_FIELD.from_int(v) for v in circuit.instance]]

    @jax.jit
    def run(sc, pts, chals):
        td = PrecomputedChallengeTranscript(sc, pts, list(chals))
        proof = PlonkSuccinctVerifier.read_proof(protocol, instances, td, Bdfg21)
        accs = PlonkSuccinctVerifier.verify(
            srs.g_dev, protocol, instances, proof, Bdfg21
        )
        return decide_all(srs, accs)

    chals = jnp.stack([FR_FIELD.from_int(c) for c in tv.challenges], 0)
    assert bool(run(sc, pts, chals).all())

    # wrong challenge sequence (tampered host replay) must fail
    bad = list(tv.challenges)
    bad[0] = (bad[0] + 1) % FR.p
    bad_chals = jnp.stack([FR_FIELD.from_int(c) for c in bad], 0)
    assert not bool(run(sc, pts, bad_chals).all())

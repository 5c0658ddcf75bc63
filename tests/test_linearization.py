"""The two non-default linearization strategies (reference
protocol.rs:503-513, proof.rs:250-278) — protocols that actually take the
`WithoutConstant` and `MinusVanishingTimesQuotient` branches of
verifier/plonk/verifier.py::commitments, native + device, accept + reject."""

import jax
import pytest

from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.sdk.aggregation import batch_verify
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.linearized_plonk import (
    MINUS_VANISHING,
    WITHOUT_CONSTANT,
    LinearizedPlonk,
    compile_protocol,
    gen_snark,
)
from snark_verifier_tpu.verifier.plonk.verifier import verify_snark_native


@pytest.fixture(scope="module")
def setup():
    srs = toy_srs(32)
    circuit = LinearizedPlonk.rand(k=3, seed=5)
    out = {}
    for strat in (MINUS_VANISHING, WITHOUT_CONSTANT):
        protocol = compile_protocol(circuit, srs, strategy=strat)
        # gen_snark(check=True) already runs the native-loader verifier —
        # the native accept case for this branch.
        out[strat] = (protocol, gen_snark(circuit, protocol, srs, "shplonk"))
    return srs, circuit, out


@pytest.mark.parametrize("strat", [MINUS_VANISHING, WITHOUT_CONSTANT])
def test_native_accepts(setup, strat):
    srs, _, out = setup
    protocol, snark = out[strat]
    assert protocol.linearization == strat
    assert verify_snark_native(snark, srs, "shplonk")


@pytest.mark.parametrize("strat", [MINUS_VANISHING, WITHOUT_CONSTANT])
def test_native_rejects_tampered_eval(setup, strat):
    srs, _, out = setup
    protocol, snark = out[strat]
    bad = Snark(protocol=protocol, instances=[],
                scalars=list(snark.scalars), points=list(snark.points))
    bad.scalars[0] = (bad.scalars[0] + 1) % FR.p
    assert not verify_snark_native(bad, srs, "shplonk")


@pytest.mark.parametrize("strat", [MINUS_VANISHING, WITHOUT_CONSTANT])
@pytest.mark.slow
def test_device_accepts_and_rejects(setup, strat):
    srs, _, out = setup
    protocol, snark = out[strat]
    bad = Snark(protocol=protocol, instances=[],
                scalars=list(snark.scalars), points=list(snark.points))
    bad.scalars[0] = (bad.scalars[0] + 1) % FR.p
    oks = batch_verify([snark, bad], srs, "shplonk")
    assert [bool(v) for v in oks] == [True, False]


@pytest.mark.slow
def test_gwc_scheme_also_works(setup):
    srs, circuit, out = setup
    protocol, _ = out[MINUS_VANISHING]
    snark = gen_snark(circuit, protocol, srs, "gwc")
    assert verify_snark_native(snark, srs, "gwc")
    oks = batch_verify([snark], srs, "gwc")
    assert bool(oks.all())


@pytest.mark.parametrize("strat", [MINUS_VANISHING, WITHOUT_CONSTANT])
def test_protocol_json_roundtrip_preserves_linearization(setup, strat):
    from snark_verifier_tpu.verifier.plonk.protocol import PlonkProtocol

    srs, _, out = setup
    protocol, snark = out[strat]
    again = PlonkProtocol.from_json(protocol.to_json())
    assert again.linearization == strat
    assert again.content_hash() == protocol.content_hash()
    # a verify through the deserialized protocol still works
    s2 = Snark(protocol=again, instances=[], scalars=snark.scalars,
               points=snark.points)
    assert verify_snark_native(s2, srs, "shplonk")

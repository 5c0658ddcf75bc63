"""End-to-end PLONK: StandardPlonk host prover -> device PlonkVerifier ->
pairing decide (the minimum E2E slice of SURVEY.md §7, BASELINE config #1
shape), for both GWC and SHPLONK.
"""

import jax
import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ec import from_affine_int
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.pcs.kzg.decider import decide_all
from snark_verifier_tpu.pcs.kzg.multiopen import Bdfg21, Gwc19
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, prove
from snark_verifier_tpu.transcript import PoseidonTranscript
from snark_verifier_tpu.verifier.plonk.verifier import (
    PlonkSuccinctVerifier,
    PlonkVerifier,
)

pytestmark = pytest.mark.slow  # 688s: device verify e2e compiles; nightly tier


def _roundtrip(scheme_name, scheme, tamper=False):
    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=5)
    protocol = build_protocol(circuit, srs)
    scalars, points = prove(circuit, protocol, srs, scheme=scheme_name)

    sc = jnp.stack([FR_FIELD.from_int(s) for s in scalars], 0)
    pts = from_affine_int(points)[:, :2, :]
    td = PoseidonTranscript(scalars=sc, points=pts)
    instance_vals = list(circuit.instance)
    if tamper:
        instance_vals[0] = (instance_vals[0] + 1) % FR.p
    instances = [[FR_FIELD.from_int(v) for v in instance_vals]]

    proof = PlonkSuccinctVerifier.read_proof(protocol, instances, td, scheme)
    accs = PlonkSuccinctVerifier.verify(srs.g_dev, protocol, instances, proof, scheme)
    assert len(accs) == 1
    ok = jax.jit(lambda a: decide_all(srs, a))(accs)
    return bool(ok.all())


@pytest.mark.parametrize(
    "name,scheme", [("gwc", Gwc19), ("shplonk", Bdfg21)], ids=["gwc", "shplonk"]
)
def test_plonk_e2e_accepts(name, scheme):
    assert _roundtrip(name, scheme)


@pytest.mark.parametrize(
    "name,scheme", [("gwc", Gwc19), ("shplonk", Bdfg21)], ids=["gwc", "shplonk"]
)
def test_plonk_e2e_rejects_wrong_instance(name, scheme):
    assert not _roundtrip(name, scheme, tamper=True)


def test_plonk_protocol_json_roundtrip():
    import json

    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=6)
    protocol = build_protocol(circuit, srs)
    from snark_verifier_tpu.verifier.plonk.protocol import PlonkProtocol

    j = json.dumps(protocol.to_json())
    p2 = PlonkProtocol.from_json(json.loads(j))
    assert p2.to_json() == protocol.to_json()
    assert [q for q in p2.queries] == [q for q in protocol.queries]

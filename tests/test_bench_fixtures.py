"""Integrity of the committed bench fixtures (benchmarks/fixtures/vanilla_k10).

bench.py measures throughput on these committed snarks; without this test a
fixture-invalidating change (protocol IR edit, codec change, corrupted JSON)
would first surface as a failed bench ON THE CHIP rather than in the suite.
One snark per family (shplonk / keccak-transcript / gwc) is re-verified with
the python native-loader oracle, and the committed protocol/SRS must still
deserialize and agree with the snarks' embedded protocol.
"""

import os

import pytest

from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import load_params
from snark_verifier_tpu.verifier.plonk.verifier import verify_snark_native

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "fixtures", "vanilla_k10",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="bench fixtures not present"
)

FAMILIES = [
    ("snark_00.json", "shplonk", "poseidon"),
    ("evmsnark_00.json", "shplonk", "evm"),
    ("gwcsnark_00.json", "gwc", "poseidon"),
]


@pytest.mark.parametrize("fname,scheme,transcript", FAMILIES)
def test_fixture_native_verify(fname, scheme, transcript):
    path = os.path.join(FIXDIR, fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not generated")
    srs = load_params(os.path.join(FIXDIR, "srs.bin"))
    snark = Snark.load(path)
    snark.validate()
    assert verify_snark_native(snark, srs, scheme, transcript=transcript)


@pytest.mark.parametrize("fname,scheme,transcript", FAMILIES)
def test_fixture_tamper_rejected(fname, scheme, transcript):
    from snark_verifier_tpu.ff.spec import FR

    path = os.path.join(FIXDIR, fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not generated")
    srs = load_params(os.path.join(FIXDIR, "srs.bin"))
    s = Snark.load(path)
    tam = Snark(s.protocol, [list(s.instances[0])], s.scalars, s.points)
    tam.instances[0][0] = (tam.instances[0][0] + 1) % FR.p
    assert not verify_snark_native(tam, srs, scheme, transcript=transcript)


def test_fixture_families_complete():
    """bench.py tiles 16 distinct snarks per family; all 3 families must be
    fully committed so every BENCH_SCHEME/BENCH_TRANSCRIPT combination runs
    on its documented workload."""
    for prefix in ("snark_", "evmsnark_", "gwcsnark_"):
        n = sum(1 for f in os.listdir(FIXDIR) if f.startswith(prefix))
        assert n == 16, f"{prefix}: {n} fixtures committed, want 16"

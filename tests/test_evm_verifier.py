"""EVM verifier code generation + in-process execution (reference parity:
gen_evm_verifier at snark-verifier-sdk/src/evm.rs:122-176, evm_verify at
:178-192, Yul loader at snark-verifier/src/loader/evm/loader.rs).

The generic verifier runs under the EVM codegen loader to emit a Yul
contract; the contract is executed by the in-repo Yul interpreter with
py_ec/py_pairing as the BN254 precompiles.  Host-only (no device graphs)."""

import pytest

from snark_verifier_tpu import errors
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.loader.yul_interp import execute_yul
from snark_verifier_tpu.sdk.evm import (
    encode_calldata,
    estimate_code_size,
    estimate_gas,
    evm_verify,
    gen_evm_verifier,
    gen_evm_verifier_report,
)
from snark_verifier_tpu.sdk.proof_io import proof_to_bytes
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, prove
from snark_verifier_tpu.transcript import EvmTranscriptPy

EIP170_LIMIT = 24576  # reference asserts deployability (loader/evm/test.rs:17-21)


# ----------------------------------------------------------- yul interpreter


def test_yul_interp_basics():
    src = """object "t" { object "Runtime" { code {
        let x := 5
        let y := add(x, 0x10)
        mstore(0x00, mulmod(y, 3, 7))
        if iszero(eq(mload(0x00), 0)) { mstore(0x20, 1) }
        return(0x20, 0x20)
    } } }"""
    ok, _gas, data = execute_yul(src, b"")
    # (5 + 0x10) * 3 % 7 == 63 % 7 == 0, so the branch must NOT run
    assert ok and data == b"\x00" * 32


def test_yul_interp_branch_semantics():
    src = """object "t" { object "Runtime" { code {
        mstore(0x00, 42)
        if eq(mload(0x00), 42) { mstore(0x20, 7) }
        if eq(mload(0x00), 43) { mstore(0x40, 9) }
        return(0x20, 0x40)
    } } }"""
    ok, _gas, data = execute_yul(src, b"")
    assert ok
    assert int.from_bytes(data[:32], "big") == 7
    assert int.from_bytes(data[32:], "big") == 0


def test_yul_interp_ec_precompiles():
    from snark_verifier_tpu.ec import py_ec

    g = (1, 2)
    g2 = py_ec.add(g, g)
    src = """object "t" { object "Runtime" { code {
        mstore(0x00, 1)
        mstore(0x20, 2)
        mstore(0x40, 1)
        mstore(0x60, 2)
        let ok := staticcall(gas(), 0x6, 0x00, 0x80, 0x80, 0x40)
        if iszero(ok) { revert(0, 0) }
        return(0x80, 0x40)
    } } }"""
    ok, _gas, data = execute_yul(src, b"")
    assert ok
    assert int.from_bytes(data[:32], "big") == g2[0]
    assert int.from_bytes(data[32:], "big") == g2[1]


def test_yul_interp_rejects_off_curve_point():
    src = """object "t" { object "Runtime" { code {
        mstore(0x00, 1)
        mstore(0x20, 3)
        mstore(0x40, 1)
        mstore(0x60, 2)
        let ok := staticcall(gas(), 0x6, 0x00, 0x80, 0x80, 0x40)
        if iszero(ok) { revert(0, 0) }
        return(0x80, 0x40)
    } } }"""
    ok, _gas, _data = execute_yul(src, b"")
    assert not ok  # (1, 3) is not on the curve -> precompile failure -> revert


# -------------------------------------------------------------- e2e verify


@pytest.fixture(scope="module")
def std_setup():
    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=11)
    protocol = build_protocol(circuit, srs)
    return srs, circuit, protocol


def _evm_snark(circuit, protocol, srs, scheme):
    t = EvmTranscriptPy()
    scalars, points = prove(circuit, protocol, srs, scheme=scheme, transcript=t)
    return Snark(protocol, [list(circuit.instance)], scalars, points)


@pytest.mark.parametrize("scheme", ["shplonk", "gwc"])
def test_evm_verifier_accepts_and_rejects(std_setup, scheme):
    srs, circuit, protocol = std_setup
    snark = _evm_snark(circuit, protocol, srs, scheme)
    proof = proof_to_bytes(snark, scheme, fmt="evm")

    yul = gen_evm_verifier(protocol, srs, scheme)
    gas = evm_verify(yul, snark.instances, proof)
    assert gas > 100_000  # two pairings alone are 113k

    # tampered proof byte -> challenge divergence -> revert
    bad = bytearray(proof)
    bad[1] ^= 1
    with pytest.raises(errors.AssertionFailure):
        evm_verify(yul, snark.instances, bytes(bad))

    # wrong public input -> revert
    bad_inst = [[(snark.instances[0][0] + 1) % FR.p]]
    with pytest.raises(errors.AssertionFailure):
        evm_verify(yul, bad_inst, proof)

    # off-curve proof point -> validate_ec_point catches it -> revert
    bad2 = bytearray(proof)
    bad2[31] ^= 1  # x of the first witness commitment
    with pytest.raises(errors.AssertionFailure):
        evm_verify(yul, snark.instances, bytes(bad2))


def test_evm_verifier_code_size_and_gas_model(std_setup):
    srs, circuit, protocol = std_setup
    yul, rep = gen_evm_verifier_report(protocol, srs, "shplonk")
    assert rep["estimated_code_size"] <= EIP170_LIMIT
    snark = _evm_snark(circuit, protocol, srs, "shplonk")
    gas = evm_verify(yul, snark.instances, proof_to_bytes(snark, "shplonk", fmt="evm"))
    # measured interpreter gas should be within 2x of the analytic model
    assert rep["estimated_gas"] * 0.5 <= gas <= rep["estimated_gas"] * 2.0


def test_calldata_layout():
    # instances are 32-byte BE words before the proof (util.rs:81-94)
    cd = encode_calldata([[1, 2], [3]], b"\xAA\xBB")
    assert len(cd) == 3 * 32 + 2
    assert cd[31] == 1 and cd[63] == 2 and cd[95] == 3 and cd[96:] == b"\xAA\xBB"


def test_estimate_gas_matches_reference_model():
    from snark_verifier_tpu.verifier.cost import Cost

    import math

    # reference formula (loader/evm/util.rs:97-105)
    c = Cost(num_instance=4, num_commitment=10, num_evaluation=20, num_msm=15, num_pairing=2)
    proof_size = 10 * 64 + (20 + 4) * 32
    expect = 21000 + math.ceil(proof_size * 15.25) + 45100 + 2 * 34000 + (15 - 2) * 6350
    assert estimate_gas(c) == expect


def test_evm_verifier_with_accumulator():
    """The reference's evm-verifier-with-accumulator shape
    (examples/evm-verifier-with-accumulator.rs): a snark carrying a folded
    accumulator in its instances gets an EVM verifier that decodes the
    limbs (shl-composition + on-curve validation, accumulator.rs:97-124)
    and decides BOTH accumulators with the keccak-RLC batch fold
    (decider.rs:129-170) — one pairing for the whole thing."""
    from snark_verifier_tpu.pcs.kzg.accumulation import KzgAs
    from snark_verifier_tpu.pcs.kzg.accumulator import accumulator_to_limbs_int
    from snark_verifier_tpu.system.standard_plonk import prove as std_prove
    from snark_verifier_tpu.transcript import PoseidonTranscriptPy
    from snark_verifier_tpu.verifier.plonk.verifier import succinct_verify_native

    srs = toy_srs(32)
    # two leaves -> native succinct verify -> KzgAs fold
    leaf_accs = []
    for seed in (21, 22):
        circ = StandardPlonk.rand(k=3, seed=seed)
        proto = build_protocol(circ, srs)
        t = PoseidonTranscriptPy()
        scalars, points = std_prove(circ, proto, srs, scheme="shplonk", transcript=t)
        leaf = Snark(proto, [list(circ.instance)], scalars, points)
        leaf_accs.append(succinct_verify_native(leaf, srs, "shplonk")[0])
    folded = KzgAs.create_proof((srs.g, srs.g1_powers[1]), leaf_accs,
                                PoseidonTranscriptPy())
    limbs = accumulator_to_limbs_int(folded)

    # aggregation snark carrying the limbs, proved under the EVM transcript
    circ = StandardPlonk.rand(k=4, seed=23, num_instance=12)
    for i, v in enumerate(limbs):
        delta = (v - circ.instance[i]) % FR.p
        circ.c[i] = (circ.c[i] - delta) % FR.p
        circ.instance[i] = v
    protocol = build_protocol(circ, srs)
    protocol.accumulator_indices = [[(0, j) for j in range(12)]]
    t = EvmTranscriptPy()
    scalars, points = prove(circ, protocol, srs, scheme="shplonk", transcript=t)
    snark = Snark(protocol, [list(circ.instance)], scalars, points)
    proof = proof_to_bytes(snark, "shplonk", fmt="evm")

    yul = gen_evm_verifier(protocol, srs, "shplonk")
    # the RLC fold must be present: ONE pairing precompile call, and a
    # keccak over the stacked accumulator coordinates
    assert yul.count("staticcall(gas(), 0x8") == 1
    gas = evm_verify(yul, snark.instances, proof)
    assert gas > 100_000

    # corrupting a limb must fail validate_ec_point on the decoded point
    bad = [list(snark.instances[0])]
    bad[0][0] = (bad[0][0] + 1) % FR.p
    with pytest.raises(errors.AssertionFailure):
        evm_verify(yul, bad, proof)

    # an on-curve but invalid old accumulator must fail the pairing
    from snark_verifier_tpu.ec import py_ec

    p1, p2 = py_ec.rand_points(2, seed=77)
    bad_limbs = accumulator_to_limbs_int((p1, p2))
    circ2 = StandardPlonk.rand(k=4, seed=23, num_instance=12)
    for i, v in enumerate(bad_limbs):
        delta = (v - circ2.instance[i]) % FR.p
        circ2.c[i] = (circ2.c[i] - delta) % FR.p
        circ2.instance[i] = v
    proto2 = build_protocol(circ2, srs)
    proto2.accumulator_indices = [[(0, j) for j in range(12)]]
    t2 = EvmTranscriptPy()
    sc2, pt2 = prove(circ2, proto2, srs, scheme="shplonk", transcript=t2)
    snark2 = Snark(proto2, [list(circ2.instance)], sc2, pt2)
    yul2 = gen_evm_verifier(proto2, srs, "shplonk")
    with pytest.raises(errors.AssertionFailure):
        evm_verify(yul2, snark2.instances, proof_to_bytes(snark2, "shplonk", fmt="evm"))

"""Recursion interface end-to-end: the full aggregation contract of the
reference — fold N leaf accumulators (KzgAs prover), expose the folded
accumulator as 4·LIMBS limb instances of an "aggregation snark", set
`accumulator_indices`, and verify THAT snark through PlonkProof.read ->
old_accumulators decode -> decide_all, where ONE decide covers both the
fresh PCS accumulator and the limb-decoded old one.

Reference anchors: snark-verifier-sdk/src/halo2/aggregation.rs:261-272
(limb exposure), snark-verifier/src/pcs/kzg/accumulator.rs:50-78 (decode),
examples/recursion.rs:456-805 (the IVC loop this is the TPU-idiomatic
throughput analogue of)."""

import pytest

from snark_verifier_tpu import errors
from snark_verifier_tpu.ec import py_ec
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.pcs.kzg.accumulation import KzgAs
from snark_verifier_tpu.pcs.kzg.accumulator import (
    accumulator_from_limbs_int,
    accumulator_to_limbs_int,
)
from snark_verifier_tpu.sdk.aggregation import batch_verify
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, gen_snark
from snark_verifier_tpu.transcript import PoseidonTranscriptPy
from snark_verifier_tpu.verifier.plonk.verifier import (

    succinct_verify_native,
    verify_snark_native,
)

pytestmark = pytest.mark.slow  # 9+ min: recursion e2e compiles; nightly tier

R = FR.p


def _agg_circuit_with_instances(limbs, k=4, seed=77):
    """StandardPlonk circuit carrying the 12 accumulator limbs as its public
    instances (re-solving c on the instance rows; q_c is all-ones)."""
    c = StandardPlonk.rand(k=k, seed=seed, num_instance=len(limbs))
    for i, v in enumerate(limbs):
        delta = (v - c.instance[i]) % R
        c.c[i] = (c.c[i] - delta) % R
        c.instance[i] = v
    return c


@pytest.fixture(scope="module")
def folded():
    srs = toy_srs(32)
    # 1) leaves: three independently-proved snarks
    leaves = []
    for seed in (1, 2, 3):
        circ = StandardPlonk.rand(k=3, seed=seed)
        protocol = build_protocol(circ, srs)
        leaves.append(gen_snark(circ, protocol, srs, scheme="shplonk"))

    # 2) native succinct verify -> leaf accumulators (affine int)
    leaf_accs = []
    for s in leaves:
        accs = succinct_verify_native(s, srs, "shplonk")
        assert len(accs) == 1
        leaf_accs.append(accs[0])

    # 3) KzgAs fold with ZK blinding pair (accumulation.rs:146-195)
    t = PoseidonTranscriptPy()
    pk_blind = (srs.g, srs.g1_powers[1])
    folded_acc = KzgAs.create_proof(pk_blind, leaf_accs, t)
    return srs, leaf_accs, folded_acc


def test_limb_roundtrip(folded):
    _, _, acc = folded
    limbs = accumulator_to_limbs_int(acc)
    assert len(limbs) == 12
    assert accumulator_from_limbs_int(limbs) == acc


def test_aggregation_snark_e2e(folded):
    srs, _, acc = folded
    limbs = accumulator_to_limbs_int(acc)

    # 4) aggregation snark: limbs exposed as instances + accumulator_indices
    circ = _agg_circuit_with_instances(limbs)
    protocol = build_protocol(circ, srs)
    protocol.accumulator_indices = [[(0, j) for j in range(12)]]
    # gen_snark's native self-check already decides BOTH accumulators
    snark = gen_snark(circ, protocol, srs, scheme="shplonk")
    assert snark.protocol.accumulator_indices

    # 5) device path: PlonkProof.read decodes old_accumulators from the
    # instance limbs; decide_all covers the fresh accumulator AND the
    # limb-decoded old one in one batched pairing check
    oks = batch_verify([snark], srs, "shplonk")
    assert bool(oks.all())


def test_aggregation_snark_rejects_corrupted_limb(folded):
    srs, _, acc = folded
    limbs = accumulator_to_limbs_int(acc)
    circ = _agg_circuit_with_instances(limbs)
    protocol = build_protocol(circ, srs)
    protocol.accumulator_indices = [[(0, j) for j in range(12)]]
    snark = gen_snark(circ, protocol, srs, scheme="shplonk")

    # corrupt one limb post-proving: the decoded accumulator point leaves
    # the curve, and deserialization-time validation must catch it before
    # any device math (snark.validate / C1 error model)
    bad = Snark(snark.protocol, [list(snark.instances[0])], snark.scalars, snark.points)
    bad.instances[0][0] = (bad.instances[0][0] + 1) % R
    with pytest.raises(errors.InvalidInstances):
        bad.validate()


def test_aggregation_snark_rejects_invalid_old_accumulator(folded):
    srs, _, _ = folded
    # on-curve but NOT a valid deferred-pairing pair: random points
    p1, p2 = py_ec.rand_points(2, seed=99)
    limbs = accumulator_to_limbs_int((p1, p2))
    circ = _agg_circuit_with_instances(limbs, seed=78)
    protocol = build_protocol(circ, srs)
    protocol.accumulator_indices = [[(0, j) for j in range(12)]]
    snark = gen_snark(circ, protocol, srs, scheme="shplonk", check=False)

    # the proof itself is sound, the carried accumulator is not:
    # native and device verifiers must both reject at the decide step
    assert not verify_snark_native(snark, srs, "shplonk")
    oks = batch_verify([snark], srs, "shplonk")
    assert not bool(oks.all())


def test_fold_verify_native_roundtrip(folded):
    """KzgAs.verify (native loader) recomputes the prover's fold from the
    leaf accumulators + blind pair + transcript (accumulation.rs:40-62)."""
    srs, leaf_accs, acc = folded
    # replay the prover transcript: common all leaf accumulators, read the
    # blind pair, squeeze r
    t = PoseidonTranscriptPy()
    for lhs, rhs in leaf_accs:
        t.common_ec_point(lhs)
        t.common_ec_point(rhs)
    # recreate the prover to capture its blind pair stream
    t2 = PoseidonTranscriptPy()
    acc2 = KzgAs.create_proof((srs.g, srs.g1_powers[1]), leaf_accs, t2)
    assert acc2 == acc  # deterministic rng default
    _, blind_pts = t2.streams()
    assert len(blind_pts) == 2

    r_t = PoseidonTranscriptPy(points=blind_pts)
    for lhs, rhs in leaf_accs:
        r_t.common_ec_point(lhs)
        r_t.common_ec_point(rhs)
    blind = (r_t.read_ec_point(), r_t.read_ec_point())
    r = r_t.squeeze_challenge()

    # native fold: sum r^i * acc_i (+ r^k * blind)
    pairs = leaf_accs + [blind]
    lhs = rhs = None
    pr = 1
    for l_, rh in pairs:
        lhs = py_ec.add(lhs, py_ec.scalar_mul(l_, pr))
        rhs = py_ec.add(rhs, py_ec.scalar_mul(rh, pr))
        pr = pr * r % R
    assert (lhs, rhs) == acc

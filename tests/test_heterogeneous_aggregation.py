"""Heterogeneous-protocol aggregation: two DIFFERENT circuits (StandardPlonk
k=3 and the full-equation vanilla-PLONK k=6 with permutation + lookup +
user challenge) folded into ONE accumulator and decided with ONE pairing —
the reference's zkevm+state shape
(/root/reference/snark-verifier-sdk/benches/zkevm_plus_state.rs,
snark-verifier-sdk/src/halo2/aggregation.rs:203-245)."""

import jax
import pytest

from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.pcs.kzg.decider import decide
from snark_verifier_tpu.sdk.aggregation import (
    aggregate_heterogeneous,
    aggregate_heterogeneous_and_decide,
    batch_verify,
)
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system import standard_plonk as sp
from snark_verifier_tpu.system import vanilla_plonk as vp

from test_vanilla_plonk import make_assignment, make_spec

pytestmark = pytest.mark.slow  # multi-protocol verify compiles; nightly tier


@pytest.fixture(scope="module")
def setup():
    # ONE SRS large enough for both domains (vanilla K=6 needs 8*64).
    srs = toy_srs(8 * 64)

    # family A: StandardPlonk k=3, two snarks with different instances
    base = sp.StandardPlonk.rand(k=3, seed=42)
    proto_a = sp.build_protocol(base, srs)
    snarks_a = []
    for i in range(2):
        c = sp.StandardPlonk.rand(k=3, seed=42)
        c.instance = [(c.instance[0] + i * 11) % FR.p]
        n = 1 << c.k
        inst_padded = c.instance + [0] * (n - 1)
        for row in range(n):
            acc = (
                c.q_a[row] * c.a[row]
                + c.q_b[row] * c.b[row]
                + c.q_ab[row] * c.a[row] * c.b[row]
                + c.q_const[row]
                + inst_padded[row]
                + c.q_rot[row] * c.a[(row + 1) % n]
            ) % FR.p
            c.c[row] = (-acc) * pow(c.q_c[row], -1, FR.p) % FR.p
        snarks_a.append(sp.gen_snark(c, proto_a, srs, scheme="shplonk"))

    # family B: vanilla-PLONK K=6 (perm + lookup + challenge)
    spec = make_spec()
    asg = make_assignment(spec)
    proto_b = vp.compile_protocol(spec, asg.fixed, asg.copies, srs)
    snark_b = vp.gen_snark(asg, proto_b, srs, scheme="shplonk")

    assert proto_a.content_hash() != proto_b.content_hash()
    return srs, snarks_a, snark_b


def test_mixed_batch_accepts(setup):
    srs, snarks_a, snark_b = setup
    # interleaved order: grouping must not depend on adjacency
    batch = [snarks_a[0], snark_b, snarks_a[1]]
    lhs, rhs = aggregate_heterogeneous(batch, srs, "shplonk")
    assert lhs.shape == (3, 16)
    assert bool(jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs))


def test_mixed_batch_rejects_tampered_member(setup):
    srs, snarks_a, snark_b = setup
    bad = Snark(
        protocol=snark_b.protocol,
        instances=[[(snark_b.instances[0][0] + 1) % FR.p]],
        scalars=snark_b.scalars,
        points=snark_b.points,
    )
    ok = aggregate_heterogeneous_and_decide(
        [snarks_a[0], bad, snarks_a[1]], srs, "shplonk"
    )
    assert not bool(ok)


def test_mixed_batch_rejects_tampered_standard_member(setup):
    srs, snarks_a, snark_b = setup
    bad = Snark(
        protocol=snarks_a[0].protocol,
        instances=[[(snarks_a[0].instances[0][0] + 1) % FR.p]],
        scalars=snarks_a[0].scalars,
        points=snarks_a[0].points,
    )
    ok = aggregate_heterogeneous_and_decide([bad, snark_b], srs, "shplonk")
    assert not bool(ok)


def test_single_group_matches_homogeneous_aggregate(setup):
    """With one protocol the heterogeneous path must reduce to `aggregate`
    exactly (same fold transcript order => identical accumulator)."""
    import numpy as np

    from snark_verifier_tpu.sdk.aggregation import aggregate

    srs, snarks_a, _ = setup
    l1, r1 = aggregate(snarks_a, srs, "shplonk")
    l2, r2 = aggregate_heterogeneous(snarks_a, srs, "shplonk")
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))


def test_homogeneous_kernel_rejects_mixed_protocols(setup):
    srs, snarks_a, snark_b = setup
    from snark_verifier_tpu.sdk.aggregation import batch_succinct_verify

    with pytest.raises(AssertionError, match="aggregate_heterogeneous"):
        batch_succinct_verify([snarks_a[0], snark_b], srs, "shplonk")

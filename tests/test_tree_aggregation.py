"""Two-layer recursive aggregation (BASELINE config #5 shape at test scale):
leaves -> per-device fold -> cross-device fold -> ONE pairing."""

import jax
import numpy as np
import pytest

from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.pcs.kzg.decider import decide
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.sdk.tree_aggregation import tree_aggregate, tree_aggregate_sharded
from snark_verifier_tpu.system.standard_plonk import (

    StandardPlonk,
    build_protocol,
    gen_snark,
)

pytestmark = pytest.mark.slow  # mesh tree-fold compiles; nightly tier


@pytest.fixture(scope="module")
def setup():
    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=13)
    protocol = build_protocol(circuit, srs)
    snark = gen_snark(circuit, protocol, srs, scheme="shplonk")
    return srs, protocol, snark


def test_tree_aggregate_local(setup):
    srs, protocol, snark = setup
    lhs, rhs = tree_aggregate([snark] * 8, srs, "shplonk", fanout=4)
    assert bool(jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs))


def test_tree_aggregate_sharded_two_layer(setup):
    srs, protocol, snark = setup
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("batch",))
    lhs, rhs, ok = tree_aggregate_sharded([snark] * 8, srs, mesh, "shplonk")
    assert bool(ok)

    # corrupt one leaf: the root fold must fail the pairing
    bad = Snark(
        protocol=protocol,
        instances=[[(snark.instances[0][0] + 1) % FR.p]],
        scalars=snark.scalars,
        points=snark.points,
    )
    _, _, ok2 = tree_aggregate_sharded([snark] * 7 + [bad], srs, mesh, "shplonk")
    assert not bool(ok2)

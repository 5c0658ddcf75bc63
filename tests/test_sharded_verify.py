"""Mesh-sharded batch verification on the 8-virtual-device CPU mesh
(SURVEY.md §7 stage 7 at test scale)."""

import jax
import numpy as np
import pytest

from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.parallel import batch_verify_sharded
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import (

    StandardPlonk,
    build_protocol,
    gen_snark,
)

pytestmark = pytest.mark.slow  # mesh verify compiles; nightly tier


def test_batch_verify_sharded_matches_local():
    srs = toy_srs(32)
    base = StandardPlonk.rand(k=3, seed=42)
    protocol = build_protocol(base, srs)
    good = gen_snark(base, protocol, srs, scheme="shplonk")
    bad = Snark(
        protocol=protocol,
        instances=[[(good.instances[0][0] + 1) % FR.p]],
        scalars=good.scalars,
        points=good.points,
    )
    # batch of 4: shard over 2 devices
    snarks = [good, bad, good, good]
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("batch",))
    oks = batch_verify_sharded(snarks, srs, mesh, "shplonk")
    assert [bool(v) for v in oks] == [True, False, True, True]

    from snark_verifier_tpu.sdk.aggregation import batch_verify

    local = batch_verify(snarks, srs, "shplonk")
    assert [bool(v) for v in local] == [bool(v) for v in oks]


def test_cost_model():
    from snark_verifier_tpu.verifier.cost import estimate_plonk_cost

    srs = toy_srs(32)
    protocol = build_protocol(StandardPlonk.rand(k=3, seed=1), srs)
    c = estimate_plonk_cost(protocol, "shplonk")
    assert c.num_pairing == 2
    assert c.num_evaluation == len(protocol.evaluations)
    g = estimate_plonk_cost(protocol, "gwc")
    assert g.num_commitment > c.num_commitment - 2  # gwc has per-set Ws

"""KZG multiopen round-trips: host prover -> device verifier -> device
pairing decider (SURVEY.md §7 stages 4-6 gates, PCS part).

Mirrors the reference's round-trip test strategy (pcs/ipa.rs:412-444 does the
same for IPA: random polys, commit, open, succinct-verify, decide)."""

import random

import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ec import from_affine_int
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.loader.msm_expr import MsmExpr
from snark_verifier_tpu.pcs.kzg.accumulation import KzgAs
from snark_verifier_tpu.pcs.kzg.decider import decide, decide_all
import jax


def jdecide(srs, lhs, rhs):
    return jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs)
from snark_verifier_tpu.pcs.kzg.multiopen import Bdfg21, Gwc19, Query, _affine_to_proj
from snark_verifier_tpu.pcs.kzg.prover_py import gwc_open, shplonk_open
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.transcript import PoseidonTranscript, PoseidonTranscriptPy
from snark_verifier_tpu.utils import py_poly as pp

pytestmark = pytest.mark.slow  # 901s: multiopen roundtrip compiles; nightly tier


def _setup(scheme, seed=7, tamper=False):
    rng = random.Random(seed)
    srs = toy_srs(32)
    polys = [pp.rand_poly(10, rng) for _ in range(3)]
    comms = [srs.commit(f) for f in polys]
    shifts = [1, 5]
    # poly0 opened at both shifts, poly1 at shift 1, poly2 at both
    qdefs = [(0, shifts[0]), (0, shifts[1]), (1, shifts[0]), (2, shifts[0]), (2, shifts[1])]

    # ---- host prover
    t = PoseidonTranscriptPy()
    for c in comms:
        t.write_ec_point(c)
    z = t.squeeze_challenge()
    queries_int = []
    for poly, shift in qdefs:
        ev = pp.peval(polys[poly], z * shift % FR.p)
        if tamper and poly == 1:
            ev = (ev + 1) % FR.p
        t.write_scalar(ev)
        queries_int.append(Query(poly, shift, ev))
    opener = gwc_open if scheme is Gwc19 else shplonk_open
    if not tamper:
        opener(srs, polys, queries_int, z, t)
    else:
        # produce a structurally-valid proof for the untampered evals, then
        # the verifier sees the tampered eval stream
        honest = [Query(q.poly, q.shift, pp.peval(polys[q.poly], z * q.shift % FR.p)) for q in queries_int]
        opener(srs, polys, honest, z, t)
    scalars_int, points_int = t.streams()

    # ---- device verifier
    sc = jnp.stack([FR_FIELD.from_int(s) for s in scalars_int], 0)
    pts = from_affine_int(points_int)[:, :2, :]
    td = PoseidonTranscript(scalars=sc, points=pts)
    comms_dev = [MsmExpr.base(_affine_to_proj(p)) for p in td.read_n_ec_points(3)]
    z_dev = td.squeeze_challenge()
    evals_dev = td.read_n_scalars(len(qdefs))
    queries_dev = [
        Query(poly, shift, ev) for (poly, shift), ev in zip(qdefs, evals_dev)
    ]
    proof = scheme.read_proof(queries_dev, td)
    lhs, rhs = scheme.verify(srs.g_dev, comms_dev, z_dev, queries_dev, proof)
    return srs, (lhs, rhs)


@pytest.mark.parametrize("scheme", [Gwc19, Bdfg21], ids=["gwc19", "bdfg21"])
def test_kzg_roundtrip_accepts(scheme):
    srs, acc = _setup(scheme)
    assert bool(jdecide(srs, *acc))


@pytest.mark.parametrize("scheme", [Gwc19, Bdfg21], ids=["gwc19", "bdfg21"])
def test_kzg_rejects_tampered_eval(scheme):
    srs, acc = _setup(scheme, tamper=True)
    assert not bool(jdecide(srs, *acc))


def test_kzg_as_fold_roundtrip():
    """3 accumulators -> host AS prover fold == device AS verify fold, and the
    folded accumulator still decides (reference accumulation.rs round-trip)."""
    from snark_verifier_tpu.ec import py_ec, to_affine_int

    srs = toy_srs(32)
    rng = random.Random(3)
    # build valid accumulators (a·τ·G, a·G) which satisfy the pairing
    accs_int = []
    for _ in range(3):
        a = rng.randrange(1, FR.p)
        lhs = py_ec.scalar_mul(srs.g1_powers[1], a)  # a·τ·G
        rhs = py_ec.scalar_mul(srs.g1_powers[0], a)  # a·G
        accs_int.append((lhs, rhs))

    # host prover fold
    tp = PoseidonTranscriptPy()
    folded_int = KzgAs.create_proof(None, accs_int, tp)

    # device verifier fold (same transcript stream: no blind, only commons)
    accs_dev = [
        (from_affine_int([l])[0], from_affine_int([r])[0]) for l, r in accs_int
    ]
    td = PoseidonTranscript(
        scalars=jnp.zeros((0, 16), jnp.uint32), points=jnp.zeros((0, 2, 16), jnp.uint32)
    )
    proof = KzgAs.read_proof(False, accs_dev, td)
    lhs, rhs = KzgAs.verify(accs_dev, proof)
    assert to_affine_int(lhs) == folded_int[0]
    assert to_affine_int(rhs) == folded_int[1]
    assert bool(jdecide(srs, lhs, rhs))

    # decide_all over the originals too
    all_accs = [
        (
            _affine_to_proj(a[0])[None] if False else from_affine_int([l]),
            from_affine_int([r]),
        )
        for (l, r), a in zip(accs_int, accs_dev)
    ]
    outs = jax.jit(lambda accs: decide_all(srs, accs))([(l[0], r[0]) for l, r in all_accs])
    assert [bool(v) for v in outs] == [True, True, True]

"""BGH19 multiopen round-trip, split into its own module: compiling this
test's graphs after the other IPA tests in one process triggers a
reproducible XLA:CPU codegen segfault in this image's jaxlib (see
tests/test_ipa.py header); in a fresh process it is fine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ec.g1 import from_affine_int
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.loader.msm_expr import MsmExpr
from snark_verifier_tpu.pcs.ipa import IpaDecidingKey, IpaProvingKey, decide
from snark_verifier_tpu.transcript.poseidon_transcript import (
    PoseidonTranscript,
    PoseidonTranscriptPy,
)
from snark_verifier_tpu.utils.py_poly import peval

pytestmark = pytest.mark.slow  # multi-minute multiopen compile; nightly tier

K = 5
R_MOD = FR.p


def _rand_poly(n, rng):
    return [int.from_bytes(rng.bytes(32)) % R_MOD for _ in range(n)]


def _dev_transcript(tr_py):
    scalars, points = tr_py.streams()
    return PoseidonTranscript(
        scalars=jnp.stack([FR_FIELD.from_int(s) for s in scalars])
        if scalars else jnp.zeros((0, 16), jnp.uint32),
        points=jnp.stack([from_affine_int([p])[0][:2] for p in points])
        if points else jnp.zeros((0, 2, 16), jnp.uint32),
    )


@pytest.mark.parametrize("zk", [False])
def test_bgh19_multiopen_roundtrip(zk):
    """BGH19 multiopen round-trip (reference pcs/ipa/multiopen/bgh19.rs):
    3 polys, poly0 opened at x and w*x, all at x -> 2 query sets; verify on
    device and decide the accumulator."""
    from snark_verifier_tpu.pcs.ipa.bgh19 import Bgh19
    from snark_verifier_tpu.pcs.kzg.multiopen import Query

    rng = np.random.default_rng(41)
    pk = IpaProvingKey.rand(K, zk=zk, seed=42)
    svk = pk.svk()
    polys = [_rand_poly(pk.n, rng) for _ in range(3)]
    x = int.from_bytes(rng.bytes(32)) % R_MOD
    w = 7  # arbitrary shift
    q_int = [
        Query(0, 1, peval(polys[0], x)),
        Query(0, w, peval(polys[0], w * x % R_MOD)),
        Query(1, 1, peval(polys[1], x)),
        Query(2, 1, peval(polys[2], x)),
    ]
    commits = [pk.commit(p) for p in polys]

    tr = PoseidonTranscriptPy()
    acc_prover = Bgh19.open(pk, polys, q_int, x, tr, seed=43)

    tr_dev = _dev_transcript(tr)
    q_dev = [Query(q.poly, q.shift, FR_FIELD.from_int(q.eval)) for q in q_int]
    comm_dev = [MsmExpr.base(from_affine_int([c])[0]) for c in commits]
    proof = Bgh19.read_proof(svk, q_dev, tr_dev)
    acc, ok = Bgh19.verify(svk, comm_dev, FR_FIELD.from_int(x), q_dev, proof)
    assert bool(ok), "BGH19 verify failed"
    assert [int(v) for v in FR_FIELD.to_int(jnp.stack(acc.xi))] == acc_prover.xi

    dk = IpaDecidingKey(svk, pk.g)
    assert bool(decide(dk, acc))

    # tampered eval rejected
    q_bad = list(q_dev)
    q_bad[2] = Query(1, 1, FR_FIELD.from_int((q_int[2].eval + 1) % R_MOD))
    tr_dev2 = _dev_transcript(tr)
    proof2 = Bgh19.read_proof(svk, q_bad, tr_dev2)
    _, ok2 = Bgh19.verify(svk, comm_dev, FR_FIELD.from_int(x), q_bad, proof2)
    assert not bool(ok2)

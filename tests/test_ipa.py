"""IPA PCS + accumulation scheme round-trips (reference parity:
/root/reference/snark-verifier/src/pcs/ipa.rs:412-444 and
ipa/accumulation.rs:228-279, adapted to BN254 + Poseidon transcript)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snark_verifier_tpu.ec.g1 import from_affine_int
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.loader.msm_expr import MsmExpr
from snark_verifier_tpu.pcs.ipa import (
    Ipa,
    IpaAccumulator,
    IpaAs,
    IpaDecidingKey,
    IpaProvingKey,
    decide,
)
from snark_verifier_tpu.pcs.ipa.ipa import h_coeffs_int, h_eval_int
from snark_verifier_tpu.transcript.poseidon_transcript import (
    PoseidonTranscript,
    PoseidonTranscriptPy,
)
from snark_verifier_tpu.utils.py_poly import peval

pytestmark = pytest.mark.slow  # 1055s: IPA prover+verifier+decider compiles; nightly tier

# KNOWN FLAKE on some hosts: this image's XLA:CPU codegen can segfault
# while (re)compiling the Poseidon permute inside test_bgh19_multiopen_
# roundtrip — reproduced with the persistent cache off, with serialized
# codegen (--xla_cpu_parallel_codegen_split_count=1), and with a permute
# pre-warm, so it is a genuine jaxlib bug, not fixable from test code.
# The conftest isolation runner retries the module in a fresh process.

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


@pytest.mark.parametrize("zk", [False, True])
def test_ipa_roundtrip(zk):
    rng = np.random.default_rng(3)
    pk = IpaProvingKey.rand(K, zk=zk, seed=4)
    p = _rand_poly(pk.n, rng)
    omega = int.from_bytes(rng.bytes(32)) % R_MOD if zk else None
    c = pk.commit(p, omega)
    z = int.from_bytes(rng.bytes(32)) % R_MOD
    v = peval(p, z)

    tr = PoseidonTranscriptPy()
    acc_prover = Ipa.create_proof(pk, p, z, omega, tr, seed=5)

    svk = pk.svk()
    tr_dev = _dev_transcript(tr)
    proof = Ipa.read_proof(svk, tr_dev)
    commitment = MsmExpr.base(from_affine_int([c])[0])
    acc, ok = Ipa.succinct_verify(
        svk, commitment, FR_FIELD.from_int(z), FR_FIELD.from_int(v), proof
    )
    assert bool(ok), "succinct verify failed"
    # verifier challenges match the prover's (transcript parity)
    assert [int(x) for x in FR_FIELD.to_int(jnp.stack(acc.xi))] == acc_prover.xi

    dk = IpaDecidingKey(svk, pk.g)
    assert bool(decide(dk, acc)), "decider rejected a valid accumulator"

    # decider rejects a corrupted accumulator
    bad = IpaAccumulator(acc.xi, jnp.asarray(from_affine_int([pk.h])[0]))
    assert not bool(decide(dk, bad))


def test_ipa_rejects_tampered_eval():
    rng = np.random.default_rng(7)
    pk = IpaProvingKey.rand(K, zk=False, seed=8)
    p = _rand_poly(pk.n, rng)
    c = pk.commit(p)
    z = int.from_bytes(rng.bytes(32)) % R_MOD
    v_bad = (peval(p, z) + 1) % R_MOD

    tr = PoseidonTranscriptPy()
    Ipa.create_proof(pk, p, z, None, tr, seed=9)
    svk = pk.svk()
    proof = Ipa.read_proof(svk, _dev_transcript(tr))
    _, ok = Ipa.succinct_verify(
        svk, MsmExpr.base(from_affine_int([c])[0]),
        FR_FIELD.from_int(z), FR_FIELD.from_int(v_bad), proof,
    )
    assert not bool(ok)


def test_h_coeffs_h_eval_consistency():
    rng = np.random.default_rng(11)
    xi = [int.from_bytes(rng.bytes(32)) % R_MOD for _ in range(K)]
    z = int.from_bytes(rng.bytes(32)) % R_MOD
    assert peval(h_coeffs_int(xi), z) == h_eval_int(xi, z)


@pytest.mark.parametrize("zk", [False, True])
def test_ipa_as_fold_roundtrip(zk):
    """Fold N accumulators into one and decide it (reference
    accumulation.rs:228-279, N=4 for test speed)."""
    rng = np.random.default_rng(13)
    pk = IpaProvingKey.rand(K, zk=zk, seed=14)
    svk = pk.svk()

    # build N real accumulators from real openings
    accs_int = []
    for i in range(4):
        p = _rand_poly(pk.n, rng)
        omega = int.from_bytes(rng.bytes(32)) % R_MOD if zk else None
        z = int.from_bytes(rng.bytes(32)) % R_MOD
        tr = PoseidonTranscriptPy()
        accs_int.append(Ipa.create_proof(pk, p, z, omega, tr, seed=20 + i))

    tr = PoseidonTranscriptPy()
    folded_prover = IpaAs.create_proof(pk, accs_int, tr, seed=30)

    accs_dev = [
        IpaAccumulator(
            [FR_FIELD.from_int(x) for x in a.xi], from_affine_int([a.u])[0]
        )
        for a in accs_int
    ]
    tr_dev = _dev_transcript(tr)
    proof = IpaAs.read_proof(svk, accs_dev, tr_dev)
    folded, ok = IpaAs.verify(svk, accs_dev, proof)
    assert bool(ok), "AS verify failed"
    assert [int(x) for x in FR_FIELD.to_int(jnp.stack(folded.xi))] == folded_prover.xi

    dk = IpaDecidingKey(svk, pk.g)
    assert bool(decide(dk, folded))

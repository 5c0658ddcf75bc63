"""The query-instance protocol family: `instance_committing_key` makes the
verifier commit to the instance polynomials itself and absorb the commitment
(reference system/halo2.rs:724-756, verifier/plonk/proof.rs:62-102), instead
of absorbing raw instance scalars and evaluating them via Lagrange sums.

Drives verifier/plonk/verifier.py's ick branch through both the native and
device loaders and pins down the observable semantics: the committed point
equals MSM(bases, instances) (+ constant), it is absorbed as an EC point,
and the instance columns get commitment slots in the linearization rather
than Lagrange evaluations."""

import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ec import py_ec, to_affine_int
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.loader.base import NATIVE
from snark_verifier_tpu.transcript import PoseidonTranscript, PoseidonTranscriptPy
from snark_verifier_tpu.verifier.plonk.verifier import PlonkProof

R = FR.p


class _Proto:
    """Minimal protocol stub exposing just what PlonkProof.read touches
    before the PCS stage."""

    def __init__(self, bases, constant=None):
        self.transcript_initial_state = 7
        self.num_instance = [len(bases)]
        self.num_witness = []
        self.num_challenge = []
        self.evaluations = []
        self.queries = []
        self.accumulator_indices = []
        self.instance_committing_key = {"bases": bases, "constant": constant}

        class _Q:
            @staticmethod
            def num_chunk():
                return 0

        self.quotient = _Q()

    class domain:  # only rotate() is touched via empty_queries
        @staticmethod
        def rotate(r):
            return 1


class _NullPcs:
    @staticmethod
    def read_proof(queries, transcript):
        return {}


def test_ick_native_commits_and_absorbs():
    bases = py_ec.rand_points(3, seed=1)
    instances = [[5, 7, 11]]
    proto = _Proto(bases)

    t = PoseidonTranscriptPy()
    proof = PlonkProof.read(proto, instances, t, _NullPcs, L=NATIVE)
    want = py_ec.msm(bases, instances[0])
    assert proof.committed_instances == [want]

    # the transcript absorbed exactly: initial state, then the committed
    # POINT (x, y) — not the three raw scalars.  read() then squeezed z.
    t2 = PoseidonTranscriptPy()
    t2.common_scalar(7)
    t2.common_ec_point(want)
    assert proof.z == t2.squeeze_challenge()


def test_ick_constant_term():
    bases = py_ec.rand_points(2, seed=2)
    const_pt = py_ec.rand_points(1, seed=3)[0]
    proto = _Proto(bases, constant=const_pt)
    instances = [[3, 4]]
    t = PoseidonTranscriptPy()
    proof = PlonkProof.read(proto, instances, t, _NullPcs, L=NATIVE)
    want = py_ec.add(py_ec.msm(bases, instances[0]), const_pt)
    assert proof.committed_instances == [want]


def test_ick_device_matches_native():
    bases = py_ec.rand_points(3, seed=4)
    vals = [13, 17, 19]
    proto = _Proto(bases)

    tn = PoseidonTranscriptPy()
    pn = PlonkProof.read(proto, [vals], tn, _NullPcs, L=NATIVE)

    td = PoseidonTranscript(
        scalars=jnp.zeros((0, 16), "uint32"),
        points=jnp.zeros((0, 2, 16), "uint32"),
    )
    pd = PlonkProof.read(
        proto, [[FR_FIELD.from_int(v) for v in vals]], td, _NullPcs
    )
    assert to_affine_int(pd.committed_instances[0]) == pn.committed_instances[0]
    got = int(FR_FIELD.to_int(td.squeeze_challenge()))
    assert got == tn.squeeze_challenge()

"""Generic PLONK verifier, written once against an abstract Loader.

Mirrors the reference verifier layer:
  * PlonkProof.read — transcript-driven proof parsing
    (/root/reference/snark-verifier/src/verifier/plonk/proof.rs:52-153)
  * instance evals via Lagrange (:283-318), linearization Msm assembly
    (:179-281), query collection (:156-177)
  * PlonkSuccinctVerifier.verify (verifier/plonk.rs:58-92) -> accumulators
  * PlonkVerifier.verify = succinct + decide_all (:125-134)

Execution model: the protocol is host data (trace constants); scalars/points
are loader handles.  Under loader.DEVICE the whole read+verify composes into
one jit-able function batchable over a proof batch; under loader.NATIVE it is
a python-int oracle run (prover self-checks, tests); under the EVM loader it
emits a Yul verifier contract (loader/evm_loader.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ...loader.base import DEVICE
from ...pcs.kzg.multiopen import Query as PcsQuery
from .protocol import PlonkProtocol, Query, R


class CommonPolynomialEvaluation:
    """z^n, (z^n - 1), Lagrange_i(z) with one batched inversion
    (protocol.rs:188-279)."""

    def __init__(self, domain, lagranges: List[int], z, L=DEVICE):
        self.zn = L.pow_static(z, domain.n)
        self.zn_minus_one = L.sub(self.zn, L.scalar(1))
        self.identity = z

        numer = L.mul(self.zn_minus_one, L.scalar(domain.n_inv))
        omegas = [domain.rotate(i) for i in lagranges]
        numers = [L.mul(numer, L.scalar(w)) for w in omegas]
        denoms = [L.sub(z, L.scalar(w)) for w in omegas]
        # batch invert lagrange denominators + (z^n - 1)
        invs = L.batch_inv(denoms + [self.zn_minus_one])
        self.zn_minus_one_inv = invs[-1]
        self.lagrange = {
            i: L.mul(num, invs[j]) for j, (i, num) in enumerate(zip(lagranges, numers))
        }

    def get(self, cp):
        if cp[0] == "identity":
            return self.identity
        return self.lagrange[cp[1]]


class PlonkProof:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    @staticmethod
    def read(protocol: PlonkProtocol, instances, transcript, pcs_scheme, L=DEVICE):
        """instances: list (per instance column) of lists of loader scalars."""
        if protocol.transcript_initial_state is not None:
            transcript.common_scalar(L.scalar(protocol.transcript_initial_state))

        if [len(i) for i in instances] != protocol.num_instance:
            from ...errors import InvalidInstances

            raise InvalidInstances(
                f"{[len(i) for i in instances]} != {protocol.num_instance}"
            )

        committed_instances = None
        if protocol.instance_committing_key is not None:
            # query-instance protocol family (IPA-style): the verifier commits
            # to the instance polynomials itself (system/halo2.rs:724-756)
            ick = protocol.instance_committing_key
            committed_instances = []
            for cols in instances:
                expr = L.msm_sum(
                    [L.msm_base_int(b) * s for s, b in zip(cols, ick["bases"])]
                )
                if ick.get("constant") is not None:
                    expr = expr + L.msm_base_int(ick["constant"])
                pt = L.msm_evaluate(expr)
                committed_instances.append(pt)
                transcript.common_ec_point(L.affine(pt))
        else:
            for cols in instances:
                for v in cols:
                    transcript.common_scalar(v)

        witnesses, challenges = [], []
        for n, m in zip(protocol.num_witness, protocol.num_challenge):
            witnesses.extend(transcript.read_n_ec_points(n))
            challenges.extend(transcript.squeeze_challenge() for _ in range(m))

        quotients = transcript.read_n_ec_points(protocol.quotient.num_chunk())
        z = transcript.squeeze_challenge()
        evaluations = transcript.read_n_scalars(len(protocol.evaluations))

        pcs_proof = pcs_scheme.read_proof(
            PlonkProof.empty_queries(protocol), transcript
        )

        old_accumulators = []
        for acc_idx in protocol.accumulator_indices:
            limbs = [instances[i][j] for (i, j) in acc_idx]
            old_accumulators.append(L.accumulator_from_limbs(limbs))

        return PlonkProof(
            committed_instances=committed_instances,
            witnesses=witnesses,
            challenges=challenges,
            quotients=quotients,
            z=z,
            evaluations=evaluations,
            pcs=pcs_proof,
            old_accumulators=old_accumulators,
        )

    @staticmethod
    def empty_queries(protocol: PlonkProtocol) -> List[PcsQuery]:
        return [
            PcsQuery(q.poly, protocol.domain.rotate(q.rotation))
            for q in protocol.queries
        ]

    def queries(self, protocol, evaluations: Dict) -> List[PcsQuery]:
        out = []
        for q, pq in zip(protocol.queries, PlonkProof.empty_queries(protocol)):
            out.append(PcsQuery(pq.poly, pq.shift, evaluations[q]))
        return out

    def instance_evals_and_map(self, protocol, instances, cpe, L=DEVICE) -> Dict:
        """evaluations map: Query -> loader scalar (proof.rs:283-318)."""
        evals: Dict[Query, object] = {}
        if protocol.instance_committing_key is None:
            offset = len(protocol.preprocessed)
            rng = range(offset, offset + len(protocol.num_instance))
            inst_queries = [
                q for q in protocol.quotient.numerator.used_query() if q.poly in rng
            ]
            for q in inst_queries:
                cols = instances[q.poly - offset]
                acc = None
                for i, v in enumerate(cols):
                    term = L.mul(v, cpe.get(("lagrange", i - q.rotation)))
                    acc = term if acc is None else L.add(acc, term)
                if acc is None:
                    acc = L.scalar(0)
                evals[q] = acc
        for q, v in zip(protocol.evaluations, self.evaluations):
            evals[q] = v
        return evals

    def commitments(self, protocol, cpe, evaluations: Dict, L=DEVICE) -> List:
        """Linearization Msm assembly (proof.rs:179-281)."""
        comms: List = []
        for pt in protocol.preprocessed:
            comms.append(L.msm_base_int(pt))
        if self.committed_instances is not None:
            comms.extend(L.msm_base_proj(p) for p in self.committed_instances)
        else:
            comms.extend(L.msm_zero() for _ in protocol.num_instance)
        comms.extend(L.msm_base(w) for w in self.witnesses)

        def constant(v):
            return L.msm_constant(L.scalar(v))

        def common_poly(cp):
            return L.msm_constant(cpe.get(cp))

        def poly(q: Query):
            if q in evaluations:
                return L.msm_constant(evaluations[q])
            assert q.rotation == 0, f"missing query {q}"
            return comms[q.poly]

        def challenge(idx):
            return L.msm_constant(self.challenges[idx])

        def product(a, b):
            if a.size() == 0:
                return b * a.try_constant()
            if b.size() == 0:
                return a * b.try_constant()
            raise ValueError("invalid linearization")

        numerator = protocol.quotient.numerator.evaluate(
            constant,
            common_poly,
            poly,
            challenge,
            lambda a: -a,
            lambda a, b: a + b,
            product,
            lambda a, s: a * L.scalar(s),
        )

        quotient_query = Query(
            len(protocol.preprocessed) + len(protocol.num_instance) + len(self.witnesses),
            0,
        )
        zn_chunk = L.pow_static(cpe.zn, protocol.quotient.chunk_degree)
        pow_zn = L.powers(zn_chunk, len(self.quotients))
        quotient = L.msm_sum(
            [L.msm_base(c) * p for c, p in zip(self.quotients, pow_zn)]
        )

        lin = protocol.linearization
        if lin == "WithoutConstant":
            lin_query = Query(quotient_query.poly + 1, 0)
            msm, const = numerator.split()
            comms.append(quotient)
            comms.append(msm)
            base = const if const is not None else L.scalar(0)
            evaluations[quotient_query] = L.mul(
                L.add(base, evaluations[lin_query]), cpe.zn_minus_one_inv
            )
        elif lin == "MinusVanishingTimesQuotient":
            msm, const = (numerator - quotient * cpe.zn_minus_one).split()
            comms.append(msm)
            evaluations[quotient_query] = const if const is not None else L.scalar(0)
        else:
            comms.append(quotient)
            c = numerator.try_constant()
            assert c is not None, "invalid linearization"
            evaluations[quotient_query] = L.mul(c, cpe.zn_minus_one_inv)

        return comms


class PlonkSuccinctVerifier:
    """verify -> [accumulator, *old_accumulators] (verifier/plonk.rs:58-92)."""

    @staticmethod
    def read_proof(protocol, instances, transcript, pcs_scheme, L=DEVICE):
        return PlonkProof.read(protocol, instances, transcript, pcs_scheme, L=L)

    @staticmethod
    def verify(svk_g, protocol, instances, proof, pcs_scheme, L=DEVICE):
        cpe = CommonPolynomialEvaluation(
            protocol.domain, protocol.langranges(), proof.z, L=L
        )
        evaluations = proof.instance_evals_and_map(protocol, instances, cpe, L=L)
        commitments = proof.commitments(protocol, cpe, evaluations, L=L)
        queries = proof.queries(protocol, evaluations)
        accumulator = pcs_scheme.verify(
            svk_g, commitments, proof.z, queries, proof.pcs, L=L
        )
        return [accumulator] + list(proof.old_accumulators)


class PlonkVerifier:
    """Succinct verify + pairing decide over all accumulators
    (verifier/plonk.rs:125-134)."""

    read_proof = PlonkSuccinctVerifier.read_proof

    @staticmethod
    def verify(srs, protocol, instances, proof, pcs_scheme, L=DEVICE):
        accumulators = PlonkSuccinctVerifier.verify(
            L.load_svk(srs), protocol, instances, proof, pcs_scheme, L=L
        )
        return L.decide_all(srs, accumulators)


def succinct_verify_native(snark, srs, scheme_name: str = "shplonk",
                           transcript: str = "poseidon"):
    """Python-int succinct verification of an sdk.Snark -> list of
    [(lhs, rhs)] affine-int accumulators (fresh + instance-decoded old ones;
    the reference's NativeLoader PlonkSuccinctVerifier path).

    transcript: "poseidon" or "evm" (keccak, the on-chain proof family)."""
    from ...loader.base import NATIVE
    from ...pcs.kzg.multiopen import Bdfg21, Gwc19
    from ...transcript import EvmTranscriptPy, PoseidonTranscriptPy

    scheme = Bdfg21 if scheme_name == "shplonk" else Gwc19
    tcls = PoseidonTranscriptPy if transcript == "poseidon" else EvmTranscriptPy
    t = tcls(scalars=snark.scalars, points=snark.points)
    instances = [[v % R for v in col] for col in snark.instances]
    proof = PlonkProof.read(snark.protocol, instances, t, scheme, L=NATIVE)
    return PlonkSuccinctVerifier.verify(
        srs.g, snark.protocol, instances, proof, scheme, L=NATIVE
    )


def verify_snark_native(snark, srs, scheme_name: str = "shplonk",
                        transcript: str = "poseidon") -> bool:
    """Full python-int verification of an sdk.Snark (the reference's
    native-verifier path; used as the prover self-check —
    snark-verifier-sdk/src/halo2.rs:124-138)."""
    from ...loader.base import NATIVE

    accumulators = succinct_verify_native(snark, srs, scheme_name, transcript)
    return bool(NATIVE.decide_all(srs, accumulators))

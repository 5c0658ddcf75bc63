"""Generic PLONK verifier over device scalars/points.

Mirrors the reference verifier layer:
  * PlonkProof.read — transcript-driven proof parsing
    (/root/reference/snark-verifier/src/verifier/plonk/proof.rs:52-153)
  * instance evals via Lagrange (:283-318), linearization Msm assembly
    (:179-281), query collection (:156-177)
  * PlonkSuccinctVerifier.verify (verifier/plonk.rs:58-92) -> accumulators
  * PlonkVerifier.verify = succinct + decide_all (:125-134)

Execution model: the protocol is host data (trace constants); scalars/points
are device arrays; the whole read+verify composes into one jit-able function
batchable over a proof batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ...ff import FR_FIELD
from ...loader.msm_expr import MsmExpr
from ...pcs.kzg.multiopen import Query as PcsQuery, _affine_to_proj, powers
from .protocol import PlonkProtocol, Query, R

FR = FR_FIELD


class CommonPolynomialEvaluation:
    """z^n, (z^n - 1), Lagrange_i(z) with one batched inversion
    (protocol.rs:188-279)."""

    def __init__(self, domain, lagranges: List[int], z):
        self.zn = FR.pow_static(z, domain.n)
        one = jnp.broadcast_to(FR.one, self.zn.shape)
        self.zn_minus_one = FR.sub(self.zn, one)
        self.identity = z

        n_inv = FR.from_int(domain.n_inv)
        numer = FR.mul(self.zn_minus_one, n_inv)
        omegas = [domain.rotate(i) for i in lagranges]
        numers = [FR.mul(numer, FR.from_int(w)) for w in omegas]
        denoms = [FR.sub(z, FR.from_int(w)) for w in omegas]
        # batch invert lagrange denominators + (z^n - 1)
        flat = jnp.stack(denoms + [self.zn_minus_one], 0)
        invs = FR.batch_inv(flat)
        self.zn_minus_one_inv = invs[-1]
        self.lagrange = {
            i: FR.mul(num, invs[j]) for j, (i, num) in enumerate(zip(lagranges, numers))
        }

    def get(self, cp):
        if cp[0] == "identity":
            return self.identity
        return self.lagrange[cp[1]]


class PlonkProof:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    @staticmethod
    def read(protocol: PlonkProtocol, instances, transcript, pcs_scheme):
        """instances: list (per instance column) of lists of device scalars."""
        if protocol.transcript_initial_state is not None:
            transcript.common_scalar(FR.from_int(protocol.transcript_initial_state))

        if [len(i) for i in instances] != protocol.num_instance:
            from ...errors import InvalidInstances

            raise InvalidInstances(
                f"{[len(i) for i in instances]} != {protocol.num_instance}"
            )

        committed_instances = None
        if protocol.instance_committing_key is not None:
            ick = protocol.instance_committing_key
            from ...ec.g1 import from_affine_int_np

            bases = [from_affine_int_np([b])[0] for b in ick["bases"]]
            committed_instances = []
            for cols in instances:
                expr = MsmExpr.sum(
                    [MsmExpr.base(b) * s for s, b in zip(cols, bases)]
                )
                if ick.get("constant") is not None:
                    expr = expr + MsmExpr.base(from_affine_int_np([ick["constant"]])[0])
                pt = expr.evaluate()
                committed_instances.append(pt)
                from ...ec.g1 import G1

                x, y, _ = G1.to_affine(pt)
                transcript.common_ec_point(jnp.stack([x, y], axis=-2))
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
            from ...pcs.kzg.accumulator import accumulator_from_limbs

            limbs = [instances[i][j] for (i, j) in acc_idx]
            old_accumulators.append(accumulator_from_limbs(limbs))

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

    def instance_evals_and_map(self, protocol, instances, cpe) -> Dict:
        """evaluations map: Query -> device scalar (proof.rs:283-318)."""
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
                    term = FR.mul(v, cpe.get(("lagrange", i - q.rotation)))
                    acc = term if acc is None else FR.add(acc, term)
                if acc is None:
                    acc = jnp.zeros_like(FR.one)
                evals[q] = acc
        for q, v in zip(protocol.evaluations, self.evaluations):
            evals[q] = v
        return evals

    def commitments(self, protocol, cpe, evaluations: Dict) -> List[MsmExpr]:
        """Linearization Msm assembly (proof.rs:179-281)."""
        comms: List[MsmExpr] = []
        from ...ec.g1 import from_affine_int_np

        for pt in protocol.preprocessed:
            comms.append(MsmExpr.base(from_affine_int_np([pt])[0]))
        if self.committed_instances is not None:
            comms.extend(MsmExpr.base(p) for p in self.committed_instances)
        else:
            comms.extend(MsmExpr() for _ in protocol.num_instance)
        comms.extend(MsmExpr.base(_affine_to_proj(w)) for w in self.witnesses)

        def constant(v):
            return MsmExpr.constant(FR.from_int(v))

        def common_poly(cp):
            return MsmExpr.constant(cpe.get(cp))

        def poly(q: Query):
            if q in evaluations:
                return MsmExpr.constant(evaluations[q])
            assert q.rotation == 0, f"missing query {q}"
            return comms[q.poly]

        def challenge(idx):
            return MsmExpr.constant(self.challenges[idx])

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
            lambda a, s: a * FR.from_int(s),
        )

        quotient_query = Query(
            len(protocol.preprocessed) + len(protocol.num_instance) + len(self.witnesses),
            0,
        )
        zn_chunk = FR.pow_static(cpe.zn, protocol.quotient.chunk_degree)
        pow_zn = powers(zn_chunk, len(self.quotients))
        quotient = MsmExpr.sum(
            [
                MsmExpr.base(_affine_to_proj(c)) * p
                for c, p in zip(self.quotients, pow_zn)
            ]
        )

        lin = protocol.linearization
        if lin == "WithoutConstant":
            lin_query = Query(quotient_query.poly + 1, 0)
            msm, const = numerator.split()
            comms.append(quotient)
            comms.append(msm)
            base = const if const is not None else jnp.zeros_like(FR.one)
            evaluations[quotient_query] = FR.mul(
                FR.add(base, evaluations[lin_query]), cpe.zn_minus_one_inv
            )
        elif lin == "MinusVanishingTimesQuotient":
            msm, const = (numerator - quotient * cpe.zn_minus_one).split()
            comms.append(msm)
            evaluations[quotient_query] = (
                const if const is not None else jnp.zeros_like(FR.one)
            )
        else:
            comms.append(quotient)
            c = numerator.try_constant()
            assert c is not None, "invalid linearization"
            evaluations[quotient_query] = FR.mul(c, cpe.zn_minus_one_inv)

        return comms


class PlonkSuccinctVerifier:
    """verify -> [accumulator, *old_accumulators] (verifier/plonk.rs:58-92)."""

    @staticmethod
    def read_proof(protocol, instances, transcript, pcs_scheme):
        return PlonkProof.read(protocol, instances, transcript, pcs_scheme)

    @staticmethod
    def verify(svk_g, protocol, instances, proof, pcs_scheme):
        cpe = CommonPolynomialEvaluation(
            protocol.domain, protocol.langranges(), proof.z
        )
        evaluations = proof.instance_evals_and_map(protocol, instances, cpe)
        commitments = proof.commitments(protocol, cpe, evaluations)
        queries = proof.queries(protocol, evaluations)
        accumulator = pcs_scheme.verify(svk_g, commitments, proof.z, queries, proof.pcs)
        return [accumulator] + list(proof.old_accumulators)


class PlonkVerifier:
    """Succinct verify + pairing decide over all accumulators
    (verifier/plonk.rs:125-134)."""

    read_proof = PlonkSuccinctVerifier.read_proof

    @staticmethod
    def verify(srs, protocol, instances, proof, pcs_scheme):
        from ...pcs.kzg.decider import decide_all

        accumulators = PlonkSuccinctVerifier.verify(
            srs.g_dev, protocol, instances, proof, pcs_scheme
        )
        oks = decide_all(srs, accumulators)
        return oks.all(axis=0)

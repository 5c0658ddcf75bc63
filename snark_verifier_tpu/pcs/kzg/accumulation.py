"""KZG accumulation scheme (KzgAs): random-linear-combination folding of
deferred-pairing accumulators.

Mirrors /root/reference/snark-verifier/src/pcs/kzg/accumulation.rs:
  * read_proof (:113-137): common all accumulator points, optionally read the
    ZK blind pair, squeeze r
  * verify (:40-62): fold lhs/rhs separately with powers of r
  * create_proof (:146-195): prover side (host ints here), with optional
    ZK blinding pair (s·s_g, s·g)

Device accumulators are (lhs, rhs) projective G1 limb arrays; the fold is a
per-side scalar-mul + tree-sum (batched over any proof-batch prefix).
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import jax.numpy as jnp

from ...ec import py_ec
from ...ec.g1 import G1
from ...ff import FR_FIELD
from ...loader.msm_expr import MsmExpr
from .multiopen import powers

FR = FR_FIELD


class KzgAs:
    # ------------------------------------------------------------- verifier

    @staticmethod
    def read_proof(zk: bool, instances: List[Tuple], transcript):
        """instances: [(lhs, rhs)] projective (..., 3, 16) device points."""
        assert instances
        # one batched normalization for all absorbed points
        flat = jnp.stack([p for pair in instances for p in pair], axis=0)
        ax, ay, _ = G1.to_affine(flat)
        for i in range(flat.shape[0]):
            transcript.common_ec_point(jnp.stack([ax[i], ay[i]], axis=-2))
        blind = None
        if zk:
            from .multiopen import _affine_to_proj

            blind = (
                _affine_to_proj(transcript.read_ec_point()),
                _affine_to_proj(transcript.read_ec_point()),
            )
        r = transcript.squeeze_challenge()
        return {"blind": blind, "r": r}

    @staticmethod
    def verify(instances: List[Tuple], proof):
        """Fold with powers of r; returns (lhs, rhs) projective points."""
        pairs = list(instances)
        if proof["blind"] is not None:
            pairs = pairs + [proof["blind"]]
        pow_r = powers(proof["r"], len(pairs))
        lhs = MsmExpr.sum(
            [MsmExpr.base(l) * r for (l, _), r in zip(pairs, pow_r)]
        ).evaluate()
        rhs = MsmExpr.sum(
            [MsmExpr.base(rh) * r for (_, rh), r in zip(pairs, pow_r)]
        ).evaluate()
        return lhs, rhs

    # --------------------------------------------------------------- prover

    @staticmethod
    def create_proof(pk_blind, instances: List[Tuple], transcript, rng=None):
        """Host-int prover.  instances: [(lhs, rhs)] affine int tuples;
        pk_blind: None or (g, s_g) int tuples for ZK blinding.
        Returns the folded (lhs, rhs) affine int accumulator."""
        assert instances
        for lhs, rhs in instances:
            transcript.common_ec_point(lhs)
            transcript.common_ec_point(rhs)
        pairs = list(instances)
        if pk_blind is not None:
            rng = rng or random.Random(0)
            from ...ff.spec import FR as FR_SPEC

            s = rng.randrange(1, FR_SPEC.p)
            g, s_g = pk_blind
            blind = (py_ec.scalar_mul(s_g, s), py_ec.scalar_mul(g, s))
            transcript.write_ec_point(blind[0])
            transcript.write_ec_point(blind[1])
            pairs.append(blind)
        r = transcript.squeeze_challenge()
        lhs = rhs = None
        pr = 1
        from ...ff.spec import FR as FR_SPEC

        for l, rh in pairs:
            lhs = py_ec.add(lhs, py_ec.scalar_mul(l, pr))
            rhs = py_ec.add(rhs, py_ec.scalar_mul(rh, pr))
            pr = pr * r % FR_SPEC.p
        return lhs, rhs

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

    # ------------------------------------------ stacked (large-N) verifier
    #
    # Bit-identical to read_proof/verify, but the N accumulators live in ONE
    # (N, 2, 3, 16) array: the transcript absorb is a lax.scan of full
    # sponge chunks and the weighted fold one windowed MSM over the stack —
    # graph size O(1) in N.  The per-element list path above traces one
    # permutation + one scalar-mul chain PER accumulator, which at the
    # 1024-leaf tree-fold shape (BASELINE config #5) never finished
    # compiling (>45 min); the stacked path compiles in seconds.

    @staticmethod
    def read_proof_stacked(zk: bool, pairs, transcript):
        """pairs: (N, batch..., 2, 3, 16) projective (lhs, rhs) device
        stacks; batch dims (if any) must match the transcript's."""
        N = pairs.shape[0]
        # (N, batch, 2, 3, 16) -> (N, 2, batch, 3, 16) -> (2N, batch, 3, 16)
        # so the absorb order stays lhs_i, rhs_i per accumulator
        moved = jnp.moveaxis(pairs, -3, 1)
        flat = moved.reshape((2 * N,) + moved.shape[2:])
        ax, ay, _ = G1.to_affine(flat)
        transcript.absorb_ec_points_scanned(jnp.stack([ax, ay], axis=-2))
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
    def verify_stacked(pairs, proof):
        """Stacked fold: Σ rⁱ·lhsᵢ, Σ rⁱ·rhsᵢ as two windowed MSMs over the
        (N, batch..., 2, 3, 16) stack (+ the optional blind pair appended)."""
        from ...utils.timing import METER

        N = pairs.shape[0]
        if proof["blind"] is not None:
            bl = jnp.stack(proof["blind"], axis=0)[None]  # (1, 2, 3, 16)
            pairs = jnp.concatenate([pairs, bl], axis=0)
            N += 1
        pow_r = _powers_stack(proof["r"], N)  # (N, batch..., 16)
        METER.count("msm", 2)
        METER.count("msm_terms", 2 * N)
        lhs = _weighted_msm(pairs[..., 0, :, :], pow_r)
        rhs = _weighted_msm(pairs[..., 1, :, :], pow_r)
        return lhs, rhs

    @staticmethod
    def fold_hierarchical(pairs, max_chain: int = 32):
        """Two-level stacked fold of (N, 2, 3, 16) accumulators: split into
        groups of ≤ `max_chain`, fold every group in ONE batched scan
        (independent transcripts, so the sponge chains run data-parallel),
        then fold the group accumulators.

        This is the latency fix for large N: the Fiat–Shamir absorb chain is
        inherently sequential per transcript (~13 ms per permutation on the
        tunnel-attached chip), so a flat 1024-accumulator fold costs 2049
        sequential permutations (~27 s measured); two levels cost ~130
        (~1.7 s).  It is also exactly the recursion-tree shape of the
        reference's aggregation example (examples/recursion.rs — leaves,
        inner folds, root) applied inside one device.  The transcript
        structure (group size, two levels) is part of this pipeline's
        definition, like the reference's aggregation circuit shape is part
        of its.  Soundness is inductive: each level is a complete KzgAs fold
        with its own post-absorb challenge."""
        N = pairs.shape[0]
        g = max(
            (d for d in range(2, min(max_chain, N - 1) + 1) if N % d == 0),
            default=None,
        )
        if g is None or N <= max_chain:
            return KzgAs._fold_once(pairs)
        groups = N // g
        gp = jnp.moveaxis(pairs.reshape((groups, g) + pairs.shape[1:]), 1, 0)
        lhs, rhs = KzgAs._fold_once(gp, batch_shape=(groups,))  # (groups,3,16)
        return KzgAs._fold_once(jnp.stack([lhs, rhs], axis=1))

    @staticmethod
    def _fold_once(pairs, batch_shape=()):
        """One stacked fold level with a fresh Poseidon transcript."""
        from ...transcript import PoseidonTranscript

        td = PoseidonTranscript(
            scalars=jnp.zeros(batch_shape + (0, 16), jnp.uint32),
            points=jnp.zeros(batch_shape + (0, 2, 16), jnp.uint32),
            batch_shape=batch_shape,
        )
        proof = KzgAs.read_proof_stacked(False, pairs, td)
        return KzgAs.verify_stacked(pairs, proof)

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


def _powers_stack(r, n: int):
    """[1, r, r², …, r^(n-1)] as one (n, …, 16) array via associative_scan
    (the list `powers()` helper materializes n sequential mul ops)."""
    import jax

    one = jnp.broadcast_to(FR.one, r.shape)
    arr = jnp.concatenate(
        [one[None], jnp.broadcast_to(r, (n - 1,) + r.shape)], axis=0
    )
    return jax.lax.associative_scan(FR.mul, arr, axis=0)


def _weighted_msm(points, scalars_mont):
    """Σ sᵢ·Pᵢ over stacked (n, …, 3, 16) points with (n, …, 16) Montgomery
    scalars — the same windowed kernel MsmExpr.evaluate lowers to, minus the
    per-entry expression graph."""
    from ...ff.jnp_field import u16_limbs_to_digits4
    from ...loader.msm_expr import _use_rns

    pts = jnp.moveaxis(points, 0, -3)  # (..., n, 3, 16)
    scs = jnp.moveaxis(scalars_mont, 0, -2)  # (..., n, 16)
    digits = u16_limbs_to_digits4(FR.from_mont(scs))
    if _use_rns():
        from ...ec.rns_g1 import G1R, from_rns, to_rns

        return from_rns(G1R.msm_windowed(to_rns(pts), digits, c=4))
    return G1.msm_windowed(pts, digits, c=4)

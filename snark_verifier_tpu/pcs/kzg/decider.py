"""KZG accumulation decider: the final pairing check
e(lhs, g2) · e(rhs, −s·g2) == 1.

Mirrors /root/reference/snark-verifier/src/pcs/kzg/decider.rs:60-80, executed
as one batched multi-Miller-loop + final exponentiation on device; G2 line
coefficients come precomputed from the SRS (sdk/srs.py).  decide_all is the
same kernel with a batch prefix — the reference's serial loop (:70-80) becomes
one vmapped pairing check (BASELINE.md: proofs verified/sec at batch 1024).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ec.g1 import G1
from ...pairing.pairing import pairing_check


def decide(srs, lhs, rhs):
    """lhs, rhs: (..., 3, 16) projective device points -> (...,) bool.

    Inversion-free: the Miller loop evaluates lines at the PROJECTIVE
    points (each line scaled by Z — an Fq factor the final exponentiation
    kills), so no `G1.to_affine` normalization is needed.  A Z=0 input
    (point at infinity) contributes the identity e(O, Q) = 1 — the scaled
    lines collapse into the Fq2 subfield, which the easy part of the final
    exponentiation annihilates — matching the reference multi_miller_loop's
    skip-infinity semantics (accumulator validation upstream is what rejects
    infinity where it is illegal)."""
    from ...utils.timing import METER

    METER.count("pairing", 2)
    xs = jnp.stack([lhs[..., 0, :], rhs[..., 0, :]], axis=-2)  # (..., 2, 16)
    ys = jnp.stack([lhs[..., 1, :], rhs[..., 1, :]], axis=-2)
    zs = jnp.stack([lhs[..., 2, :], rhs[..., 2, :]], axis=-2)
    dbl, addc, has_add, finals = srs.decider_coeffs
    return pairing_check(xs, ys, dbl, addc, has_add, finals, zs=zs)


def decide_all(srs, accumulators):
    """accumulators: list of (lhs, rhs) -> stacked batched decide."""
    lhs = jnp.stack([a[0] for a in accumulators], 0)
    rhs = jnp.stack([a[1] for a in accumulators], 0)
    return decide(srs, lhs, rhs)

"""BN254 G1: curve instance + host-side encode/decode + small utilities.

Point layout: uint32[..., 3, 16] homogeneous projective (X, Y, Z) over Fq in
Montgomery form; infinity is (0 : 1 : 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import FQ, FR, FQ_FIELD, NLIMBS
from ..ff.spec import BN254_B, int_to_limbs, limbs_to_int
from .curve import CurveOps

G1 = CurveOps(FQ_FIELD, b=BN254_B, name="bn254_g1")


# ------------------------------------------------------------------ encoding


def from_affine_int_np(pts):
    """Pure-numpy variant of from_affine_int (trace-safe, cacheable)."""
    p, R = FQ.p, 1 << 256
    out = np.zeros((len(pts), 3, NLIMBS), dtype=np.uint32)
    for i, pt in enumerate(pts):
        if pt is None:
            out[i, 1] = int_to_limbs(R % p)
            continue
        x, y = pt
        out[i, 0] = int_to_limbs(x * R % p)
        out[i, 1] = int_to_limbs(y * R % p)
        out[i, 2] = int_to_limbs(R % p)
    return out


def from_affine_int(pts):
    """Host: list of affine (x, y) int tuples (None = infinity) -> device
    Jacobian array (n, 3, 16)."""
    F = FQ_FIELD
    p, R = FQ.p, 1 << 256
    out = np.zeros((len(pts), 3, NLIMBS), dtype=np.uint32)
    for i, pt in enumerate(pts):
        if pt is None:
            out[i, 1] = int_to_limbs(R % p)  # (0 : 1 : 0)
            continue
        x, y = pt
        out[i, 0] = int_to_limbs(x * R % p)
        out[i, 1] = int_to_limbs(y * R % p)
        out[i, 2] = int_to_limbs(R % p)  # Z = 1 in Montgomery form
    return jnp.asarray(out)


def to_affine_int(pt):
    """Host: device Jacobian array (..., 3, 16) -> affine int tuples."""
    p, R = FQ.p, 1 << 256
    rinv = pow(R, -1, p)
    arr = np.asarray(pt).reshape(-1, 3, NLIMBS)
    out = []
    for row in arr:
        x = limbs_to_int(row[0]) * rinv % p
        y = limbs_to_int(row[1]) * rinv % p
        z = limbs_to_int(row[2]) * rinv % p
        if z % p == 0:
            out.append(None)
            continue
        zi = pow(z, -1, p)
        out.append((x * zi % p, y * zi % p))
    if np.asarray(pt).ndim == 2:
        return out[0]
    return out


def generator():
    return from_affine_int([(1, 2)])[0]


# ---------------------------------------------------------------- utilities


def scalars_to_bits(scalars):
    """Host: python-int scalars -> (n, 256) uint32 little-endian bit array."""
    out = np.zeros((len(scalars), 256), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s) % FR.p
        for b in range(s.bit_length()):
            out[i, b] = (s >> b) & 1
    return jnp.asarray(out)


def msm_naive(points, bits):
    """Σ s_i · P_i with per-point double-and-add; O(n·256) adds.  Test oracle
    for the Pippenger path (runs under jit; points (n,3,16), bits (n,256))."""

    def body(acc, xs):
        pt, b = xs
        acc = G1.add(acc, G1.scalar_mul_bits(pt, b))
        return acc, None

    acc, _ = jax.lax.scan(body, G1.infinity(), (points, bits))
    return acc

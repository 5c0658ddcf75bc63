"""Symbolic MSM accumulator — the TPU analogue of the reference's lazy `Msm`
expression (/root/reference/snark-verifier/src/util/msm.rs:20-205).

Verifier layers build `constant + Σ scalarᵢ·baseᵢ` lazily with operator
overloading; `evaluate()` lowers the whole expression to device kernels in
one shot (per-base scalar muls + a balanced tree sum).  Scalars are Fr
Montgomery limb arrays (or None for coefficient 1); bases are projective G1
limb arrays.  Everything broadcasts over a shared proof-batch prefix.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from ..ec.g1 import G1
from ..ff import FR_FIELD
from ..ff.jnp_field import u16_limbs_to_digits4

FR = FR_FIELD


def _use_rns() -> bool:
    """RNS/MXU coordinate backend for MsmExpr evaluation: default ON on real
    TPU backends, OFF on CPU (where while-loops compile to native loops and
    the positional backend is both fast and much cheaper to compile).
    MSM_EXPR_RNS=0/1 overrides."""
    import os

    import jax

    env = os.environ.get("MSM_EXPR_RNS")
    if env is not None:
        return env not in ("", "0")
    return jax.default_backend() != "cpu"


class MsmExpr:
    def __init__(self, constant=None, pairs: Optional[List[Tuple]] = None):
        self.const = constant  # Fr scalar (coefficient of the generator g)
        self.pairs = list(pairs or [])  # [(scalar | None, point)]

    # ------------------------------------------------------------ builders

    @staticmethod
    def base(point) -> "MsmExpr":
        return MsmExpr(pairs=[(None, point)])

    @staticmethod
    def constant(scalar) -> "MsmExpr":
        return MsmExpr(constant=scalar)

    # ------------------------------------------------------------- algebra

    def __add__(self, other: "MsmExpr") -> "MsmExpr":
        c = self.const
        if other.const is not None:
            c = other.const if c is None else FR.add(c, other.const)
        return MsmExpr(c, self.pairs + other.pairs)

    def __sub__(self, other: "MsmExpr") -> "MsmExpr":
        return self + (-other)

    def __neg__(self) -> "MsmExpr":
        c = None if self.const is None else FR.neg(self.const)
        pairs = [(FR.neg(s) if s is not None else FR.neg(FR.one), p) for s, p in self.pairs]
        return MsmExpr(c, pairs)

    def __mul__(self, scalar) -> "MsmExpr":
        c = None if self.const is None else FR.mul(self.const, scalar)
        pairs = [
            (scalar if s is None else FR.mul(s, scalar), p) for s, p in self.pairs
        ]
        return MsmExpr(c, pairs)

    def __rmul__(self, scalar) -> "MsmExpr":
        return self * scalar

    def size(self) -> int:
        return len(self.pairs)

    def try_constant(self):
        """Constant scalar if no bases (zero scalar if empty), else None."""
        if self.pairs:
            return None
        return self.const if self.const is not None else jnp.zeros_like(FR.one)

    def split(self):
        """(bases-only MsmExpr, constant scalar or None)."""
        return MsmExpr(None, self.pairs), self.const

    @staticmethod
    def sum(exprs: List["MsmExpr"]) -> "MsmExpr":
        out = MsmExpr()
        for e in exprs:
            out = out + e
        return out

    # ------------------------------------------------------------ evaluate

    def evaluate(self, g=None):
        """Lower to device kernels; returns a projective point.  `g` is the
        generator the constant term multiplies (required if const is set)."""
        from ..utils.timing import METER

        METER.count("msm_terms", len(self.pairs) + (self.const is not None))
        METER.count("msm", 1)
        scaled_pts = []
        scaled_scalars = []
        plain_pts = []
        for s, p in self.pairs:
            if s is None:
                plain_pts.append(p)
            else:
                scaled_pts.append(p)
                scaled_scalars.append(s)
        if self.const is not None:
            assert g is not None, "constant term needs the generator"
            scaled_pts.append(jnp.broadcast_to(g, self.const.shape[:-1] + g.shape[-2:]))
            scaled_scalars.append(self.const)

        parts = []
        if scaled_pts:
            pts = jnp.stack(jnp.broadcast_arrays(*scaled_pts), axis=-3)  # (...,n,3,16)
            scs = jnp.stack(jnp.broadcast_arrays(*scaled_scalars), axis=-2)
            digits = u16_limbs_to_digits4(FR.from_mont(scs))  # (..., n, 64)
            if _use_rns():
                # Run the windowed MSM on the RNS/MXU backend: at verify-path
                # shapes the positional CIOS backend is bound by per-kernel /
                # while-iteration dispatch (~150us per field mul at (B,16)),
                # while the RNS add is a handful of MXU matmuls + elementwise
                # ops — measured round 4: the batched succinct verify's lhs
                # MSM dominates the whole phase under CIOS (25s of 27.7s at
                # B=1024) and collapses under RNS.
                from ..ec.rns_g1 import G1R, from_rns, to_rns

                acc_r = G1R.msm_windowed(to_rns(pts), digits, c=4)
                for p in plain_pts:
                    acc_r = G1R.add(acc_r, to_rns(p))
                return from_rns(acc_r)
            parts.append(G1.msm_windowed(pts, digits, c=4))
        for p in plain_pts:
            parts.append(p)
        if not parts:
            return G1.infinity()
        acc = parts[0]
        for p in parts[1:]:
            acc = G1.add(acc, p)
        return acc

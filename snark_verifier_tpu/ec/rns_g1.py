"""BN254 G1 over the RNS/MXU field core (ff/rns_field.py).

Same complete RC15 group law as ec/curve.py (CurveOps is generic over the
coordinate field); points are uint32 (..., 3, 35) RNS residue arrays in
M-Montgomery form.  Conversion helpers bridge the positional (..., 3, 16)
representation used at API boundaries.

Value-bound invariant (see RnsField): RC15 over RnsField keeps all
coordinates < ~1024p — the worst sub offset is 512p and every multiply
re-compresses to < ~20p.  tests/test_rns.py tracks bounds through the
formulas to prove it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ff import FQ
from ..ff.rns_field import get_rns_field
from ..ff.spec import BN254_B
from .curve import CurveOps

FQ_RNS = get_rns_field(FQ)

G1R = CurveOps(FQ_RNS, b=BN254_B, name="bn254_g1_rns")


def to_rns(points):
    """Positional Montgomery points (..., 3, 16) -> RNS points (..., 3, 35)."""
    return FQ_RNS.from_limbs(points)


def from_rns(points_rns):
    """RNS points (..., 3, 35) -> canonical positional points (..., 3, 16)."""
    return FQ_RNS.to_limbs(points_rns)

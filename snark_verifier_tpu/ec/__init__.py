from .curve import CurveOps
from .g1 import G1, from_affine_int, generator, msm_naive, scalars_to_bits, to_affine_int
from . import py_ec

__all__ = [
    "CurveOps",
    "G1",
    "from_affine_int",
    "generator",
    "msm_naive",
    "scalars_to_bits",
    "to_affine_int",
    "py_ec",
]

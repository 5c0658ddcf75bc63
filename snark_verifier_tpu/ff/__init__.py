from .spec import FQ, FR, MASK, NLIMBS, W, FieldSpec, int_to_limbs, limbs_to_int
from .jnp_field import LimbField, get_field

FQ_FIELD = get_field(FQ)
FR_FIELD = get_field(FR)

__all__ = [
    "FQ",
    "FR",
    "MASK",
    "NLIMBS",
    "W",
    "FieldSpec",
    "int_to_limbs",
    "limbs_to_int",
    "LimbField",
    "get_field",
    "FQ_FIELD",
    "FR_FIELD",
]

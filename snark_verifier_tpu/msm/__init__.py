from .pippenger import (
    default_capacity,
    extract_digits,
    msm,
    msm_checked,
    scalars_from_int,
)

__all__ = [
    "default_capacity",
    "extract_digits",
    "msm",
    "msm_checked",
    "scalars_from_int",
]

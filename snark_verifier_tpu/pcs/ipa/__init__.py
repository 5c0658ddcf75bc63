from .bgh19 import Bgh19
from .ipa import (
    Ipa,
    IpaAccumulator,
    IpaAs,
    IpaDecidingKey,
    IpaProvingKey,
    IpaSuccinctVerifyingKey,
    decide,
    decide_all,
    h_coeffs_int,
    h_eval_dev,
)

__all__ = [
    "Bgh19",
    "Ipa",
    "IpaDecidingKey",
    "decide",
    "decide_all",
    "IpaAccumulator",
    "IpaAs",
    "IpaProvingKey",
    "IpaSuccinctVerifyingKey",
    "h_coeffs_int",
    "h_eval_dev",
]

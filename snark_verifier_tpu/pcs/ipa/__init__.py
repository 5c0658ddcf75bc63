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

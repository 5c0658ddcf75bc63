from .tower import FQ2, FQ6, FQ12, Fq2Field, Fq6Field, Fq12Field
from .encode import (
    fq2_from_int,
    fq2_to_int,
    fq6_from_int,
    fq6_to_int,
    fq12_from_int,
    fq12_to_int,
)

__all__ = [
    "FQ2",
    "FQ6",
    "FQ12",
    "Fq2Field",
    "Fq6Field",
    "Fq12Field",
    "fq2_from_int",
    "fq2_to_int",
    "fq6_from_int",
    "fq12_from_int",
    "fq12_to_int",
]

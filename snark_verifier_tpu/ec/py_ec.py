"""Pure-Python BN254 elliptic-curve oracle (affine, python ints).

Gold model for the vectorized TPU implementation — slow, obviously-correct.
Covers G1 (over Fq) and, generically, curves over extension fields whose
elements support +,-,*,inv via a small field-ops adapter.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from ..ff.spec import FQ, BN254_B

P = FQ.p


def _inv(x: int) -> int:
    return pow(x, -1, P)


# Affine points as (x, y) int tuples; None = infinity.
G1_GEN = (1, 2)


def is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - (x * x * x + BN254_B)) % P == 0


def add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        return double(p1)
    lam = (y2 - y1) * _inv(x2 - x1) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def double(p1):
    if p1 is None:
        return None
    x1, y1 = p1
    if y1 == 0:
        return None
    lam = 3 * x1 * x1 * _inv(2 * y1) % P
    x3 = (lam * lam - 2 * x1) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def neg(p1):
    if p1 is None:
        return None
    x, y = p1
    return (x, (-y) % P)


def scalar_mul(p1, k: int):
    acc = None
    while k:
        if k & 1:
            acc = add(acc, p1)
        p1 = double(p1)
        k >>= 1
    return acc


def msm(points, scalars):
    acc = None
    for pt, s in zip(points, scalars):
        acc = add(acc, scalar_mul(pt, s))
    return acc


def rand_points(n: int, seed: int = 0):
    """n random G1 points (as multiples of the generator)."""
    rng = random.Random(seed)
    from ..ff.spec import FR

    return [scalar_mul(G1_GEN, rng.randrange(1, FR.p)) for _ in range(n)]

"""Host-side univariate polynomial arithmetic over Fr (python ints).

Coefficient lists, lowest degree first.  Used by the host-side KZG multiopen
provers (the TPU side only ever sees commitments/evals).  Mirrors the role of
`util::poly::Polynomial` (/root/reference/snark-verifier/src/util/poly.rs).
"""

from __future__ import annotations

from typing import List, Sequence

from ..ff.spec import FR

R = FR.p


def trim(p: List[int]) -> List[int]:
    while p and p[-1] % R == 0:
        p.pop()
    return p


def padd(a: Sequence[int], b: Sequence[int]) -> List[int]:
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)) % R for i in range(n)]


def psub(a: Sequence[int], b: Sequence[int]) -> List[int]:
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0)) % R for i in range(n)]


def pscale(a: Sequence[int], k: int) -> List[int]:
    return [c * k % R for c in a]


def pmul(a: Sequence[int], b: Sequence[int]) -> List[int]:
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x == 0:
            continue
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % R
    return out


def peval(p: Sequence[int], x: int) -> int:
    acc = 0
    for c in reversed(p):
        acc = (acc * x + c) % R
    return acc


def pdiv_linear(p: Sequence[int], z: int) -> List[int]:
    """Exact division by (X - z) via synthetic division; requires p(z) == 0."""
    assert peval(p, z) == 0, "not divisible by (X - z)"
    out = [0] * (len(p) - 1)
    acc = 0
    for i in range(len(p) - 1, 0, -1):
        acc = (acc * z + p[i]) % R
        out[i - 1] = acc
    return out


def vanishing(zs: Sequence[int]) -> List[int]:
    """Π (X - z_i)."""
    out = [1]
    for z in zs:
        out = pmul(out, [(-z) % R, 1])
    return out


def pdivmod(num: Sequence[int], den: Sequence[int]):
    """Polynomial long division; returns (quotient, remainder)."""
    num = list(num)
    den = trim(list(den))
    dlead_inv = pow(den[-1], -1, R)
    q = [0] * max(0, len(num) - len(den) + 1)
    while len(trim(num)) >= len(den):
        shift = len(num) - len(den)
        factor = num[-1] * dlead_inv % R
        q[shift] = factor
        for i, c in enumerate(den):
            num[shift + i] = (num[shift + i] - factor * c) % R
        num.pop()
    return q, trim(num)


def lagrange_interpolate(points) -> List[int]:
    """Interpolating polynomial through [(x_i, y_i)] (distinct x)."""
    out: List[int] = []
    for i, (xi, yi) in enumerate(points):
        num = [1]
        den = 1
        for j, (xj, _) in enumerate(points):
            if i == j:
                continue
            num = pmul(num, [(-xj) % R, 1])
            den = den * (xi - xj) % R
        out = padd(out, pscale(num, yi * pow(den, -1, R) % R))
    return out


def rand_poly(deg: int, rng) -> List[int]:
    return [rng.randrange(R) for _ in range(deg + 1)]

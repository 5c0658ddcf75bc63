"""Limb-major (SoA) G1 ops for the MSM hot path.

Point layout: (3, 16, B...) — coordinate, limb, batch — so batch rides the
VPU lanes (see ff/soa_field.py).  Same complete RC15 formulas as
ec/curve.py; independent muls stacked along a batch-side axis so each add
still issues exactly two CIOS kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ff import soa_field as F


def _stk6(*xs):
    """Stack (16,B) operands along a new axis AFTER the limb axis:
    (16, k, B) — still limb-major, batch still minor."""
    return jnp.stack(jnp.broadcast_arrays(*xs), axis=1)


def add(p, q):
    """Complete addition; p, q: (3, 16, B...)."""
    p, q = jnp.broadcast_arrays(p, q)
    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2, z2 = q[0], q[1], q[2]
    l1a = _stk6(x1, y1, z1, F.add(x1, y1), F.add(y1, z1), F.add(x1, z1))
    l1b = _stk6(x2, y2, z2, F.add(x2, y2), F.add(y2, z2), F.add(x2, z2))
    m = F.mul(l1a, l1b)  # (16, 6, B)
    t0, t1, t2 = m[:, 0], m[:, 1], m[:, 2]
    t3 = F.sub(m[:, 3], F.add(t0, t1))
    t4 = F.sub(m[:, 4], F.add(t1, t2))
    ty = F.sub(m[:, 5], F.add(t0, t2))
    t0_3 = F.add(F.double(t0), t0)
    t2b = F.mul_small(t2, 9)
    z3l = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    yb = F.mul_small(ty, 9)
    l2a = _stk6(t3, t4, yb, t1m, t0_3, z3l)
    l2b = _stk6(t1m, yb, t0_3, z3l, t3, t4)
    mm = F.mul(l2a, l2b)
    x3 = F.sub(mm[:, 0], mm[:, 1])
    y3 = F.add(mm[:, 3], mm[:, 2])
    z3 = F.add(mm[:, 5], mm[:, 4])
    return jnp.stack([x3, y3, z3], axis=0)


def double(p):
    """Complete doubling (RC15 alg. 9)."""
    x, y, z = p[0], p[1], p[2]
    m = F.mul(_stk6(y, y, z, x), _stk6(y, z, z, y))
    t0, t1, zz, xy = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
    z8 = F.double(F.double(F.double(t0)))
    t2 = F.mul_small(zz, 9)
    y3l = F.add(t0, t2)
    t0m = F.sub(t0, F.add(F.double(t2), t2))
    mm = F.mul(_stk6(t2, t1, t0m, t0m), _stk6(z8, z8, y3l, xy))
    y3 = F.add(mm[:, 2], mm[:, 0])
    x3 = F.double(mm[:, 3])
    z3 = mm[:, 1]
    return jnp.stack([x3, y3, z3], axis=0)


def infinity(batch_shape=()):
    """(0 : 1 : 0) in SoA layout."""
    from ..ff.jnp_field import get_field
    from ..ff.spec import FQ

    one = jnp.asarray(get_field(FQ).one).reshape((16,) + (1,) * len(batch_shape))
    zero = jnp.zeros((16,) + tuple(batch_shape), jnp.uint32)
    return jnp.stack([zero, jnp.broadcast_to(one, zero.shape), zero], 0)


def from_aos(pt):
    """(..., 3, 16) -> (3, 16, ...)."""
    return jnp.moveaxis(jnp.moveaxis(pt, -1, 0), -1, 0)[...]


def to_aos(pt):
    """(3, 16, ...) -> (..., 3, 16)."""
    return jnp.moveaxis(jnp.moveaxis(pt, 0, -1), 0, -1)

"""Limb-major ("structure of arrays") Fq ops for the hot batched kernels.

Layout: (16, B...) — limbs on axis 0, batch on the TRAILING axes.  On TPU the
minor axis maps to VPU lanes; with the default (B, 16) layout only 16 of 128
lanes carry data (12.5%), while (16, B) fills them.  Measured ~8x on the MSM
bucket fold.

Same math as ff/jnp_field.py (lazy [0,2p] Montgomery, CIOS scan), axes moved.
Only the ops the EC hot path needs (add/sub/mul/mul_small/double).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .spec import FQ, MASK, NLIMBS, W

_U32 = jnp.uint32
_MASK = _U32(MASK)
NINV = _U32(FQ.ninv)

import numpy as np

from .spec import int_to_limbs

_P_NP = np.asarray(FQ.p_limbs)
_P2_NP = np.asarray(int_to_limbs(2 * FQ.p))


def _col(limbs_np, bs):
    """(16,) constant -> (16, 1...1) broadcastable over batch shape bs."""
    return limbs_np.reshape((NLIMBS,) + (1,) * len(bs))


def _bshape(a):
    return a.shape[1:]


def add(a, b):
    t = a + b

    def body(c, tk):
        v = tk + c
        return v >> W, v & _MASK

    c0 = jnp.zeros(jnp.broadcast_shapes(_bshape(a), _bshape(b)), _U32)
    _, limbs = jax.lax.scan(body, c0, t)
    # conditional subtract 2p
    return _cond_sub2p(limbs)


def _sub_limbs(a, b):
    def body(borrow, ab):
        ak, bk = ab
        v = ak + _U32(1 << W) - bk - borrow
        return _U32(1) - (v >> W), v & _MASK

    b0 = jnp.zeros(jnp.broadcast_shapes(_bshape(a), _bshape(b)), _U32)
    borrow, limbs = jax.lax.scan(body, b0, (a, jnp.broadcast_to(b, a.shape)))
    return limbs, borrow


def _cond_sub2p(a):
    d, borrow = _sub_limbs(a, jnp.broadcast_to(_col(_P2_NP, _bshape(a)), a.shape))
    return jnp.where(borrow == 0, d, a)


def sub(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _sub_limbs(a, b)
    dp = d + _col(_P2_NP, _bshape(a))

    def body(c, tk):
        v = tk + c
        return v >> W, v & _MASK

    _, s = jax.lax.scan(body, jnp.zeros(_bshape(a), _U32), dp)
    return jnp.where(borrow == 1, s, d)


def mul(a, b):
    """CIOS Montgomery product; (16,B)x(16,B) -> (16,B), limbs scanned."""
    a, b = jnp.broadcast_arrays(a, b)
    bs = _bshape(a)

    def body(t, ai):
        row = ai[None] * b  # (16, B)
        t = t.at[:NLIMBS].add(row & _MASK)
        t = t.at[1 : NLIMBS + 1].add(row >> W)
        m = (t[0] * NINV) & _MASK
        row2 = m[None] * _col(_P_NP, bs)
        t = t.at[:NLIMBS].add(row2 & _MASK)
        t = t.at[1 : NLIMBS + 1].add(row2 >> W)
        t = t.at[1].add(t[0] >> W)
        t = jnp.concatenate([t[1:], jnp.zeros((1,) + bs, _U32)], axis=0)
        return t, None

    t0 = jnp.zeros((NLIMBS + 2,) + bs, _U32)
    t, _ = jax.lax.scan(body, t0, a)

    def carry(c, tk):
        v = tk + c
        return v >> W, v & _MASK

    _, s = jax.lax.scan(carry, jnp.zeros(bs, _U32), t[:NLIMBS])
    return s


def double(a):
    return add(a, a)


def mul_small(a, k: int):
    if k == 0:
        return jnp.zeros_like(a)
    acc = a
    for bit in bin(k)[3:]:
        acc = add(acc, acc)
        if bit == "1":
            acc = add(acc, a)
    return acc


def from_aos(x):
    """(..., 16) -> (16, ...): move the limb axis to the front."""
    return jnp.moveaxis(x, -1, 0)


def to_aos(x):
    return jnp.moveaxis(x, 0, -1)

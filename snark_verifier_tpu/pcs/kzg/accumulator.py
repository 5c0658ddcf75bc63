"""Accumulator limb encoding (LIMBS=3, BITS=88).

Mirrors /root/reference/snark-verifier/src/pcs/kzg/accumulator.rs:50-78 and
the SDK constants LIMBS=3/BITS=88 (snark-verifier-sdk/src/lib.rs:33-34): a
(lhs, rhs) G1 accumulator is exposed as 4*3 Fr limbs in public instances; the
decoder reassembles the four Fq coordinates.

Device note: limbs are masked to 88 bits before assembly — a malicious
encoding yields a garbage point and a failing pairing check rather than a
panic (the reference's `C::from_xy(...).unwrap()` aborts instead).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ...ff import FQ_FIELD, FR_FIELD, NLIMBS
from ...ff.spec import FQ, W

LIMBS = 3
BITS = 88


def _shift_limbs(x, nlimbs: int, nbits: int):
    """Value shift by nlimbs*16 + nbits bits within a 16-limb buffer."""
    if nlimbs:
        pad = jnp.zeros(x.shape[:-1] + (nlimbs,), x.dtype)
        x = jnp.concatenate([pad, x[..., : NLIMBS - nlimbs]], axis=-1)
    if nbits:
        hi = (x << nbits) & jnp.uint32(0xFFFF)
        lo = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1] >> (W - nbits)],
            axis=-1,
        )
        x = hi | lo
    return x


def _mask_88(c):
    """Keep the low 88 bits of a canonical u16-limb value."""
    keep = c.at[..., 5].set(c[..., 5] & jnp.uint32(0xFF))
    zero_hi = jnp.zeros_like(c[..., 6:])
    return jnp.concatenate([keep[..., :6], zero_hi], axis=-1)


def fq_from_limbs(limbs: List):
    """3 device Fr scalars (Montgomery) -> one device Fq element (Montgomery).
    value = l0 + l1*2^88 + l2*2^176."""
    cs = [_mask_88(FR_FIELD.from_mont(l)) for l in limbs]
    acc = cs[0]
    acc = acc + _shift_limbs(cs[1], 5, 8)
    acc = acc + _shift_limbs(cs[2], 11, 0)
    s, _ = FQ_FIELD._carry16(acc)
    return FQ_FIELD.to_mont(s)


def accumulator_from_limbs(limbs: List):
    """12 device Fr scalars -> (lhs, rhs) projective device points."""
    assert len(limbs) == 4 * LIMBS
    coords = [fq_from_limbs(limbs[i * LIMBS : (i + 1) * LIMBS]) for i in range(4)]
    one = jnp.broadcast_to(FQ_FIELD.one, coords[0].shape)
    lhs = jnp.stack([coords[0], coords[1], one], axis=-2)
    rhs = jnp.stack([coords[2], coords[3], one], axis=-2)
    return lhs, rhs


def accumulator_from_limbs_int(limbs: List[int]):
    """Host: 12 Fr limb ints -> ((lhs_x, lhs_y), (rhs_x, rhs_y)) affine int
    points (inverse of accumulator_to_limbs_int; used for pre-device
    validation of instance-encoded accumulators)."""
    assert len(limbs) == 4 * LIMBS
    mask = (1 << BITS) - 1
    coords = []
    for i in range(4):
        v = 0
        for j in range(LIMBS):
            v |= (limbs[i * LIMBS + j] & mask) << (BITS * j)
        coords.append(v)
    return (coords[0], coords[1]), (coords[2], coords[3])


def accumulator_to_limbs_int(acc) -> List[int]:
    """Host: affine int accumulator ((lhs_x, lhs_y), (rhs_x, rhs_y)) -> 12
    Fr limb ints (the instance encoding used by AggregationCircuit,
    reference snark-verifier-sdk/src/halo2/aggregation.rs:261-272)."""
    (lhs, rhs) = acc
    out = []
    mask = (1 << BITS) - 1
    for v in [lhs[0], lhs[1], rhs[0], rhs[1]]:
        for i in range(LIMBS):
            out.append((v >> (BITS * i)) & mask)
    return out

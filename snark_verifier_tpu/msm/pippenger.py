"""Pippenger multi-scalar multiplication, re-architected for TPU.

The reference's Pippenger (/root/reference/snark-verifier/src/util/msm.rs:
238-317) uses data-dependent bucket scatter + rayon chunk splitting — neither
maps to a SIMD machine.  This design keeps the window/bucket *semantics* but
executes them as three fully-static phases:

  1. bucket accumulation, scanned over the 32 windows (bounds peak memory):
     digit extraction -> argsort -> rank-in-bucket from searchsorted
     boundaries -> scatter point indices into a (256, capacity) matrix
     (unique slots: no scatter conflicts) -> gather -> halving tree-fold
     along the capacity axis (log2(capacity) batched complete EC adds).
  2. weighted bucket reduction Σ b·B_b: the classic running-sum pair scan
     (reference msm.rs:277-281), but vectorized across all 32 windows at
     once — 255 sequential steps of 32-lane adds, one jaxpr instance.
  3. Horner window combine: 8 doublings + 1 add per window, scanned.

All shapes are static: `capacity` bounds points per bucket.  Random
(transcript-derived) scalars distribute uniformly, so capacity = 2x mean is
astronomically safe; adversarial scalar sets can overflow a bucket, which we
*detect* (overflow flag output) rather than silently drop — `msm_checked`
retries with a larger capacity.

Multi-chip scaling (parallel/msm_sharded.py) uses MSM's linearity: shard the
point axis, run this kernel per device, tree-add the per-device results.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ec.g1 import G1

C_BITS = 8  # window size; 8 divides the 16-bit limb width -> cheap extraction
N_WINDOWS = 256 // C_BITS  # 32 windows covers the full 256-bit scalar range
N_BUCKETS = 1 << C_BITS


def default_capacity(n: int) -> int:
    """Static per-bucket capacity, pow2.  Bucket loads for uniform digits are
    ~Poisson(mean), so mean + 8*sqrt(mean) + 16 makes overflow astronomically
    unlikely across all 32*255 buckets; `msm` still flags it if it happens."""
    mean = max(1, n // N_BUCKETS)
    want = min(n, int(mean + 8 * mean**0.5 + 16))
    cap = 8
    while cap < want:
        cap *= 2
    return cap


# Fr < 2^254, so the top byte of a uniform scalar only spans [0, p>>248]:
# the top window's buckets carry ~n/49 points each, not ~n/256.
_TOP_RANGE = 49


def top_capacity(n: int) -> int:
    """Capacity for the skewed most-significant window."""
    mean = max(1, n // _TOP_RANGE)
    want = min(n, int(mean + 8 * mean**0.5 + 16))
    cap = 8
    while cap < want:
        cap *= 2
    return cap


def extract_digits(scalars_u16):
    """(n,16) canonical 16-bit limbs -> (N_WINDOWS, n) int32 digits."""
    outs = []
    for w in range(N_WINDOWS):
        limb = scalars_u16[:, w // 2]
        shift = C_BITS * (w % 2)
        outs.append(((limb >> shift) & jnp.uint32(N_BUCKETS - 1)).astype(jnp.int32))
    return jnp.stack(outs, 0)


def _bucket_accumulate(points_ext, digits, capacity: int):
    """One window's bucket sums.  points_ext: (n+1,3,16) with an infinity
    sentinel last; digits: (n,). Returns ((256,3,16) buckets, overflow)."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sorted_d = digits[order]
    starts = jnp.searchsorted(sorted_d, jnp.arange(N_BUCKETS, dtype=jnp.int32))
    pos = jnp.arange(n, dtype=jnp.int32) - starts[sorted_d]
    counts = jnp.diff(jnp.append(starts, jnp.int32(n)))
    overflow = jnp.any(counts[1:] > capacity)

    idx = jnp.full((N_BUCKETS, capacity), n, dtype=jnp.int32)
    # digit-0 entries have weight zero and may overflow bucket 0 harmlessly;
    # route them to the dropped sentinel column instead.
    tgt_pos = jnp.where(sorted_d == 0, capacity, pos)  # OOB -> dropped
    idx = idx.at[sorted_d, tgt_pos].set(order, mode="drop")
    mat = jnp.take(points_ext, idx, axis=0)  # (256, capacity, 3, 16)

    width = capacity
    while width > 1:
        half = width // 2
        mat = G1.add(mat[:, :half], mat[:, half:width])
        width = half
    return mat[:, 0], overflow


@functools.partial(jax.jit, static_argnames=("capacity",))
def msm(points, scalars_u16, capacity: Optional[int] = None):
    """Σ sᵢ·Pᵢ.  points: (n,3,16) projective; scalars_u16: (n,16) canonical
    16-bit limbs (see `scalars_from_int` / `ff.LimbField.to_repr_u16`).
    Returns (result (3,16), overflow flag)."""
    n = points.shape[0]
    if capacity is None:
        capacity = default_capacity(n)
    digits = extract_digits(scalars_u16)  # (W, n)
    points_ext = jnp.concatenate([points, G1.infinity((1,))], axis=0)

    def acc_body(ovf, dw):
        buckets, o = _bucket_accumulate(points_ext, dw, capacity)
        return ovf | o, buckets

    overflow, buckets = jax.lax.scan(acc_body, jnp.asarray(False), digits[:-1])
    # Top window separately: its digit distribution is skewed (scalars < p <
    # 2^254 concentrate the top byte), so it needs a larger static capacity.
    top_b, top_o = _bucket_accumulate(
        points_ext, digits[-1], max(capacity, top_capacity(n))
    )
    buckets = jnp.concatenate([buckets, top_b[None]], axis=0)
    overflow = overflow | top_o
    # buckets: (W, 256, 3, 16)

    # Running-sum weighted reduction, vectorized over the window axis:
    #   running += B_b (b = 255..1);  total += running.
    def rs_body(carry, bucket_b):
        running, total = carry
        running = G1.add(running, bucket_b)
        total = G1.add(total, running)
        return (running, total), None

    rev = jnp.moveaxis(buckets[:, 1:][:, ::-1], 0, 1)  # (255, W, 3, 16)
    init = (G1.infinity((N_WINDOWS,)), G1.infinity((N_WINDOWS,)))
    (_, wsums), _ = jax.lax.scan(rs_body, init, rev)  # (W, 3, 16)

    # Horner combine from the most-significant window down.
    def horner_body(acc, wsum):
        for _ in range(C_BITS):
            acc = G1.double(acc)
        return G1.add(acc, wsum), None

    acc, _ = jax.lax.scan(horner_body, G1.infinity(), wsums[::-1])
    return acc, overflow


def scalars_from_int(ints):
    """Host: python-int scalars -> (n,16) canonical uint32-held 16-bit limbs."""
    from ..ff.spec import FR, int_to_limbs

    return jnp.asarray(np.stack([int_to_limbs(int(s) % FR.p) for s in ints]))


def msm_checked(points, scalars_u16, capacity: Optional[int] = None):
    """Host wrapper: runs `msm`, grows capacity on bucket overflow (handles
    adversarial scalar distributions; each retry recompiles)."""
    n = points.shape[0]
    cap = capacity or default_capacity(n)
    while True:
        out, ovf = msm(points, scalars_u16, capacity=cap)
        if not bool(ovf):
            return out
        if cap >= max(n, 8):
            return out  # capacity covers every point; overflow impossible
        cap = min(max(n, 8), cap * 4)

"""Pippenger multi-scalar multiplication, re-architected for TPU.

The reference's Pippenger (/root/reference/snark-verifier/src/util/msm.rs:
238-317) uses data-dependent bucket scatter + rayon chunk splitting — neither
maps to a SIMD machine.  This design keeps the window/bucket *semantics* but
executes them as fully-static phases:

  1. bucket accumulation, scanned over windows (bounds peak memory):
     digit extraction -> argsort -> rank-in-bucket from searchsorted
     boundaries -> scatter point indices into a (buckets, capacity) matrix
     (unique slots: no scatter conflicts) -> gather -> halving tree-fold
     along the capacity axis (works for any capacity, not just powers of
     two — a tight capacity means ~mean+8*sqrt(mean) adds per bucket
     instead of 2x mean).
  2. weighted bucket reduction Σ b·B_b = Σ_b SuffixSum_b: a log-depth
     suffix associative_scan over the bucket axis + tree sum (the
     parallel-prefix form of the reference's running-sum pair, msm.rs:
     277-281), vectorized across all windows.
  3. Horner window combine: c doublings + 1 add per window, scanned.

Two coordinate backends share the engine:
  * positional (ec/g1.py, 16x16-bit limbs, CIOS core)
  * RNS (ec/rns_g1.py, 35 uint16 residues, MXU base extension) — ~2x faster
    per EC add and the default for large n.

All shapes are static: `capacity` bounds points per bucket.  Random
(transcript-derived) scalars distribute uniformly, so capacity = mean +
8*sqrt(mean) + 16 makes overflow ~1e-9 per MSM; adversarial scalar sets can
overflow a bucket, which we *detect* (overflow flag output) rather than
silently drop — `msm_checked` retries with a larger capacity.

Multi-chip scaling (parallel/msm_sharded.py) uses MSM's linearity: shard the
point axis, run this kernel per device, tree-add the per-device results.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ec.g1 import G1


def _pallas_fold_default() -> bool:
    """Fused Pallas bucket fold: default ON on real TPU backends
    (MSM_PALLAS_FOLD=0 reverts to the XLA fold).

    Round-2 blocker solved in round 3: 3D kernel blocks stalled the remote
    Mosaic compiler at any width; the 2D fixed-width grid fold
    (pallas_ops.fold_buckets_grid) compiles in seconds and folds a full
    (256, 4624, 105) window in 176ms — combined with the host C++ slot
    assignment this is the production 2^20 path (PERFNOTES round 3)."""
    env = os.environ.get("MSM_PALLAS_FOLD")
    if env is not None:
        return env not in ("", "0")
    return jax.default_backend() != "cpu"

C_BITS = 8  # default window size for the positional backend
SCALAR_BITS = 256


def n_windows(c: int) -> int:
    return (SCALAR_BITS + c - 1) // c


def default_capacity(n: int, n_buckets: int = 1 << C_BITS) -> int:
    """Static per-bucket capacity.  Bucket loads for uniform digits are
    ~Poisson(mean), so mean + 8*sqrt(mean) + 16 makes overflow ~1e-9 across
    all windows*buckets buckets; `msm` still flags it if it happens."""
    mean = max(1, n // n_buckets)
    return min(n, int(mean + 8 * mean**0.5 + 16))


def top_range(c: int) -> int:
    """Digit range of the most-significant window: Fr < 2^254 concentrates
    the top digits (e.g. [0, 48] for c=8)."""
    from ..ff.spec import FR

    top_shift = c * (n_windows(c) - 1)
    return (FR.p >> top_shift) + 1


def top_capacity(n: int, c: int) -> int:
    """Capacity for the top window.  Covers BOTH uniform-mod-p scalars
    (density 2^shift/p per digit) and `uniform-256-bit mod p` sampling,
    whose wraparound makes low digits ceil(2^256/p)/2^(256-shift) dense
    (~6/256 for BN254 c=8 — 15% above the naive n/49 estimate)."""
    from ..ff.spec import FR

    shift = c * (n_windows(c) - 1)
    wraps = -(-(1 << 256) // FR.p)  # ceil
    mean = max(1, n * wraps * (1 << shift) >> 256)
    return min(n, int(mean + 8 * mean**0.5 + 16))


def extract_digits(scalars_u16, c: int):
    """(n,16) canonical 16-bit limbs -> (W, n) int32 c-bit digits."""
    outs = []
    W = n_windows(c)
    padded = jnp.concatenate(
        [scalars_u16, jnp.zeros(scalars_u16.shape[:-1] + (1,), scalars_u16.dtype)],
        axis=-1,
    )
    for w in range(W):
        bit0 = w * c
        l, off = bit0 // 16, bit0 % 16
        lo = padded[:, l] >> off
        if off + c > 16:
            lo = lo | (padded[:, l + 1] << (16 - off))
        outs.append((lo & jnp.uint32((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(outs, 0)


def _tree_fold(curve, mat, axis_len: int, stop: int = 1):
    """Halving tree-sum over axis 1 of (buckets, capacity, ...) for ANY
    capacity: odd widths keep their last column for the next level.  Folds
    until the axis length is <= `stop` and returns (mat, width)."""
    width = axis_len
    while width > stop:
        half = width // 2
        lo = mat[:, :half]
        hi = mat[:, half : 2 * half]
        summed = curve.add(lo, hi)
        if width % 2:
            mat = jnp.concatenate([summed, mat[:, 2 * half : width]], axis=1)
            width = half + 1
        else:
            mat = summed
            width = half
    return mat, width


_RANK_BLK = 512  # block length for the sort-free ranking pass


def _rank_in_bucket(digits, n_buckets: int):
    """Stable rank of each element within its bucket, WITHOUT sorting.

    digits: (..., n) int32.  Returns (ranks (..., n), counts (..., n_buckets)).
    An XLA sort of 1M keys costs ~150ms/window on TPU (it lowers to while
    loops); this blocked one-hot cumsum is pure dense vector work and
    vectorizes across the window axis."""
    *batch, n = digits.shape
    nblk = n // _RANK_BLK
    assert nblk * _RANK_BLK == n, "n must be a multiple of the rank block"
    oh = (
        digits.reshape(*batch, nblk, _RANK_BLK, 1)
        == jnp.arange(n_buckets, dtype=jnp.int32)
    ).astype(jnp.uint16)
    within = jnp.cumsum(oh, axis=-2, dtype=jnp.uint16)  # inclusive, <= BLK
    blk_counts = within[..., -1, :].astype(jnp.int32)  # (..., nblk, nb)
    zeros = jnp.zeros((*batch, 1, n_buckets), jnp.int32)
    blk_prefix = jnp.concatenate(
        [zeros, jnp.cumsum(blk_counts, axis=-2)[..., :-1, :]], axis=-2
    )
    excl = (within - oh).astype(jnp.int32) + blk_prefix[..., None, :]
    ranks = (excl * oh.astype(jnp.int32)).sum(-1).reshape(*batch, n)
    return ranks, blk_counts.sum(-2)


# Deep tree-fold levels run at tiny lane counts but still pay the whole
# RC15 kernel-chain overhead (~130ms/window at 2^20); fold inside the
# window scan only down to this width, then batch every window's tail
# into one wide fold.
_FOLD_STOP = 512


def _flat_add(curve, a, b):
    """curve.add on FLAT (..., 3*L) points: lane-slices the coordinates and
    re-concats, avoiding the (..., 3, L) relayout reshape.  Identical math
    (it calls the same CurveOps.add).

    NOTE kept in the stack-based form deliberately: routing through
    CurveOps.add_xyz directly on lane slices produced a graph that
    segfaults this image's XLA:CPU compiler (round-3 bisect; TPU perf was
    unchanged either way, 8.88s vs 8.87s at 2^20, so nothing is lost)."""
    L = a.shape[-1] // 3
    pa = jnp.stack([a[..., :L], a[..., L : 2 * L], a[..., 2 * L :]], axis=-2)
    pb = jnp.stack([b[..., :L], b[..., L : 2 * L], b[..., 2 * L :]], axis=-2)
    o = curve.add(pa, pb)
    x, y, z = o[..., 0, :], o[..., 1, :], o[..., 2, :]
    return jnp.concatenate([x, y, z], axis=-1)


def _tree_fold_flat(curve, mat, axis_len: int, stop: int = 1):
    """_tree_fold over FLAT (buckets, capacity, 3*L) points."""
    width = axis_len
    while width > stop:
        half = width // 2
        summed = _flat_add(curve, mat[:, :half], mat[:, half : 2 * half])
        if width % 2:
            mat = jnp.concatenate([summed, mat[:, 2 * half : width]], axis=1)
            width = half + 1
        else:
            mat = summed
            width = half
    return mat, width


def _bucket_accumulate(curve, points_ext, idx, capacity: int, stop: int = 1):
    """One window's (partial) bucket sums from a precomputed slot-index
    matrix.  points_ext: (n+1, ...) with an infinity sentinel last; idx:
    (n_buckets, capacity) point indices (n = sentinel).  Returns
    ((n_buckets, width, 3*L) FLAT points, width) folded to width <= stop.
    Gather and fold both run on the flat (n+1, 3*L) view: TPU row-gathers of
    2D arrays are ~3x faster, and the fold avoids relayout reshapes."""
    flat = points_ext.reshape(points_ext.shape[0], -1)
    mat = jnp.take(flat, idx, axis=0)  # (n_buckets, capacity, 3*L)
    return _tree_fold_flat(curve, mat, capacity, stop=stop)


def _fold_buckets_pallas(curve, points_ext, idx, interpret: bool = False):
    """Gather + tree fold with fixed-width grid-chunked Pallas kernels (RNS
    backend only): (n_buckets, capacity) slot indices -> (n_buckets,) + elem
    bucket sums.  The gather stays in XLA (its row-gather lowering beats
    per-row DMA); the fold levels run in VMEM with a constant (bb, wb, 105)
    block shape so the Mosaic program count stays O(1) regardless of
    capacity.  Default kernel: the lane-PACKED RC15 add
    (pallas_ops.fold_buckets_grid_pk, 105-lane rows at 82% utilization,
    ~1.4x the per-coordinate kernel); MSM_PACKED_FOLD=0 reverts."""
    from .pallas_ops import fold_buckets_grid, fold_buckets_grid_pk

    packed = os.environ.get("MSM_PACKED_FOLD", "1") not in ("", "0")
    wb = int(os.environ.get("MSM_PALLAS_WB", "512"))
    layers = int(os.environ.get("MSM_PALLAS_LAYERS", "4"))
    nb, cap = idx.shape
    flat = points_ext.reshape(points_ext.shape[0], -1)  # (n+1, 105) u16
    mat = jnp.take(flat, idx, axis=0)  # (nb, cap, 105)
    identity_row = curve.infinity().reshape(-1)  # RNS-Montgomery (0:1:0)
    fold = fold_buckets_grid_pk if packed else fold_buckets_grid
    out = fold(mat, identity_row, wb=wb, layers=layers, interpret=interpret)
    return out.reshape((nb,) + points_ext.shape[1:])


def _slot_indices(digits, n_buckets: int, capacity: int):
    """Batched slot assignment for a stack of windows.

    digits: (W, n).  Returns (idx (W, n_buckets, capacity) int32 with n as
    the infinity sentinel, overflow bool).  One flattened scatter serves all
    windows (scatters are dispatch-bound, not byte-bound)."""
    W, n = digits.shape
    # Rank in window groups: the one-hot tensor is n*n_buckets*2 bytes per
    # window (~0.5GB at 2^20), so a full-W batch would blow HBM.
    G = max(1, min(W, (1 << 31) // max(1, n * n_buckets * 2)))
    if W % G:
        G = 1
    if G == W:
        ranks, counts = _rank_in_bucket(digits, n_buckets)
    else:
        _, (ranks, counts) = jax.lax.scan(
            lambda _, d: (None, _rank_in_bucket(d, n_buckets)),
            None,
            digits.reshape(W // G, G, n),
        )
        ranks = ranks.reshape(W, n)
        counts = counts.reshape(W, n_buckets)
    overflow = jnp.any(counts[:, 1:] > capacity)
    # digit-0 entries have weight zero: route them to a dropped OOB slot.
    tgt = jnp.where(digits == 0, capacity, jnp.minimum(ranks, capacity))
    comb = digits + (n_buckets * jnp.arange(W, dtype=jnp.int32))[:, None]
    # one FLAT 1D scatter with unique indices: TPU lowers 2D scatters to a
    # chunked dynamic-update-slice loop; the 1D unique form is far cheaper.
    flat_tgt = comb.reshape(-1) * (capacity + 1) + tgt.reshape(-1)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
    idx = jnp.full((W * n_buckets * (capacity + 1),), n, dtype=jnp.int32)
    idx = idx.at[flat_tgt].set(src.reshape(-1), mode="drop", unique_indices=True)
    idx = idx.reshape(W * n_buckets, capacity + 1)
    return idx[:, :capacity].reshape(W, n_buckets, capacity), overflow


def _weighted_bucket_sum(curve, buckets):
    """Σ_{b>=1} b * B_b over axis 1 of (W, n_buckets, ...), as the tree sum
    of suffix sums (log-depth, vectorized across the window axis)."""
    rev = jnp.flip(buckets[:, 1:], axis=1)  # B_{max} ... B_1
    suffix = jax.lax.associative_scan(curve.add, rev, axis=1)
    return curve.tree_sum(suffix, axis=1)  # (W, ...)


def _horner(curve, wsums, c: int):
    """Combine window sums MSB-first: acc = 2^c * acc + wsum."""

    def body(acc, wsum):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, wsum), None

    acc, _ = jax.lax.scan(body, curve.infinity(), wsums[::-1])
    return acc


def _msm_engine(curve, points_ext, scalars_u16, c: int, capacity: int,
                pallas_fold: bool = False, interpret: bool = False):
    """Generic Pippenger over any CurveOps backend.  points_ext includes the
    infinity sentinel at index n."""
    n = points_ext.shape[0] - 1
    n_buckets = 1 << c
    digits = extract_digits(scalars_u16, c)  # (W, n)

    idx_all, overflow = _slot_indices(digits[:-1], n_buckets, capacity)
    elem_shape = points_ext.shape[1:]

    # Top window separately: its digit range is [0, p >> c*(W-1)], so its
    # buckets carry far more points each — its own (smaller, taller) matrix.
    trange = top_range(c)
    tcap = max(capacity, top_capacity(n, c))
    top_idx, top_o = _slot_indices(digits[-1:], trange, tcap)

    if pallas_fold:
        def acc_body(_, idx_w):
            return None, _fold_buckets_pallas(curve, points_ext, idx_w,
                                              interpret=interpret)

        _, buckets = jax.lax.scan(acc_body, None, idx_all)  # (W-1, nb, ...)
        top_b = _fold_buckets_pallas(curve, points_ext, top_idx[0],
                                     interpret=interpret)
        overflow = overflow | top_o
    else:
        def acc_body(_, idx_w):
            part, _w = _bucket_accumulate(
                curve, points_ext, idx_w, capacity, stop=_FOLD_STOP
            )
            return None, part

        _, parts = jax.lax.scan(acc_body, None, idx_all)  # (W-1, nb, w1, ...)
        top_mat, _ = _bucket_accumulate(curve, points_ext, top_idx[0], tcap)
        overflow = overflow | top_o

        # Batch the main windows' deep fold levels together: one wide fold
        # instead of W underutilized tails.  Unflatten points only at the end
        # (the bucket arrays are tiny).
        wm1, _, w1, flat_elem = parts.shape
        tail = parts.reshape(wm1 * n_buckets, w1, flat_elem)
        folded, _ = _tree_fold_flat(curve, tail, w1)
        buckets = folded[:, 0].reshape((wm1, n_buckets) + elem_shape)
        top_b = top_mat[:, 0].reshape((trange,) + elem_shape)

    wsums = _weighted_bucket_sum(curve, buckets)  # (W-1, ...)
    top_sum = _weighted_bucket_sum(curve, top_b[None])  # (1, ...)
    wsums = jnp.concatenate([wsums, top_sum], axis=0)
    return _horner(curve, wsums, c), overflow


def _pad_to_block(points, scalars_u16):
    """Pad n up to a multiple of the ranking block with zero scalars on the
    first point (zero digits are dropped, so the result is unchanged)."""
    n = points.shape[0]
    pad = (-n) % _RANK_BLK
    if pad:
        points = jnp.concatenate(
            [points, jnp.broadcast_to(points[:1], (pad,) + points.shape[1:])], 0
        )
        scalars_u16 = jnp.concatenate(
            [scalars_u16, jnp.zeros((pad,) + scalars_u16.shape[1:],
                                    scalars_u16.dtype)], 0
        )
    return points, scalars_u16


# ------------------------------------------------------------------ frontends


@functools.partial(jax.jit, static_argnames=("capacity", "c"))
def msm(points, scalars_u16, capacity: Optional[int] = None, c: int = C_BITS):
    """Σ sᵢ·Pᵢ over the positional backend.  points: (n,3,16) projective;
    scalars_u16: (n,16) canonical 16-bit limbs (see `scalars_from_int` /
    `ff.LimbField.to_repr_u16`).  Returns (result (3,16), overflow flag)."""
    points, scalars_u16 = _pad_to_block(points, scalars_u16)
    n = points.shape[0]
    if capacity is None:
        capacity = default_capacity(n, 1 << c)
    points_ext = jnp.concatenate([points, G1.infinity((1,))], axis=0)
    return _msm_engine(G1, points_ext, scalars_u16, c, capacity)


@functools.partial(jax.jit, static_argnames=("capacity", "c", "pallas_fold",
                                              "interpret"))
def _msm_rns_jit(points, scalars_u16, capacity: int, c: int,
                 pallas_fold: bool, interpret: bool):
    from ..ec.rns_g1 import G1R, from_rns, to_rns

    points_ext = jnp.concatenate([to_rns(points), G1R.infinity((1,))], axis=0)
    out, ovf = _msm_engine(G1R, points_ext, scalars_u16, c, capacity,
                           pallas_fold=pallas_fold, interpret=interpret)
    return from_rns(out), ovf


def msm_rns(points, scalars_u16, capacity: Optional[int] = None, c: int = C_BITS,
            pallas_fold: Optional[bool] = None, interpret: bool = False):
    """Σ sᵢ·Pᵢ over the RNS/MXU backend (~2x faster per EC add; the default
    for large n).  Same interface as `msm`: positional points in, positional
    (3,16) result out; the RNS conversion happens on-device.  On TPU the
    bucket fold runs as a fused Pallas kernel (pallas_fold; see
    _pallas_fold_default)."""
    points, scalars_u16 = _pad_to_block(points, scalars_u16)
    n = points.shape[0]
    if capacity is None:
        capacity = default_capacity(n, 1 << c)
    if pallas_fold is None:
        pallas_fold = _pallas_fold_default()
    if isinstance(points, jax.core.Tracer):
        # called under jit/vmap/shard_map (e.g. parallel/msm_sharded): the
        # host-orchestrated Pallas pipeline can't run inside a trace — use
        # the single-module engine
        return _msm_rns_jit(points, scalars_u16, capacity, c, False, False)
    if pallas_fold:
        return _msm_rns_pallas_host(points, scalars_u16, capacity, c, interpret)
    return _msm_rns_jit(points, scalars_u16, capacity, c, False, False)


# Host-orchestrated Pallas variant: one monolithic jit (31-window scan with
# in-scan Mosaic kernels) OOM-kills the remote compile helper, so the MSM is
# split into three small modules — prep (digits + the one batched scatter),
# a per-window gather+fold (shared shape: compiled once, dispatched W-1
# times), and the combine (weighted bucket sums + Horner).  Dispatch cost is
# ~W tunnel round-trips, noise next to the multi-second fold work.

def _pack24(idx_np):
    """Host: (..., ) int32 point ids (< 2^24) -> (..., 3) uint8."""
    a = idx_np.astype(np.uint32)
    return np.stack(
        [(a & 0xFF), (a >> 8) & 0xFF, (a >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)


def _unpack24(idx_u8):
    """Device: (..., 3) uint8 -> (...,) int32 point ids."""
    a = idx_u8.astype(jnp.int32)
    return a[..., 0] | (a[..., 1] << 8) | (a[..., 2] << 16)


def _maybe_unpack(idx):
    return _unpack24(idx) if idx.dtype == jnp.uint8 else idx


_PALLAS_JITS: dict = {}


def _pjit(key, fn, **kw):
    f = _PALLAS_JITS.get(key)
    if f is None:
        f = jax.jit(fn, **kw)
        _PALLAS_JITS[key] = f
    return f


def _msm_rns_pallas_host(points, scalars_u16, capacity: int, c: int,
                         interpret: bool):
    from ..ec.rns_g1 import G1R, from_rns, to_rns
    from ..utils import native

    n = points.shape[0]
    n_buckets = 1 << c
    trange = top_range(c)
    tcap = max(capacity, top_capacity(n, c))

    # Slot assignment on DEVICE by default (round 4): the host C++ prep's
    # ~150MB of slot-index uploads ran at ~50MB/s through the axon tunnel
    # (3.2s against a 2.1s fold).  The device prep module (one-hot-ranking
    # scan + one flat scatter) runs in ~0.4s from scalars already on device
    # and compiles in ~3min as its own small module — measured 2.89s vs 5.6s
    # end-to-end at 2^20.  MSM_DEVICE_PREP=0 reverts to host C++ prep.
    device_prep = os.environ.get("MSM_DEVICE_PREP", "1") not in ("", "0")
    if native.available() and not interpret and not device_prep:
        # Host C++ slot assignment: same output as the device prep module
        # but ~100ms of counting instead of a ~20-minute XLA compile for a
        # 0.7s run (PERFNOTES round 3).  Only the (W, nb, cap) int32 index
        # matrices cross the host->device boundary.
        sc = np.asarray(scalars_u16).astype(np.uint64)  # (n, 16), 16-bit vals
        packed = (
            sc[:, 0::4]
            | (sc[:, 1::4] << np.uint64(16))
            | (sc[:, 2::4] << np.uint64(32))
            | (sc[:, 3::4] << np.uint64(48))
        )  # (n, 4) u64 little-endian
        idx_main, idx_top_np, ovf_host = native.slot_indices(
            packed, c, capacity, trange, tcap
        )
        pext = _pjit(
            ("prep_pts", n),
            lambda p: jnp.concatenate([to_rns(p), G1R.infinity((1,))], 0),
        )
        points_ext = pext(points)
        # Host->device index transfer is the MSM's non-compute bottleneck
        # (measured round 4: ~150MB of int32 slot matrices at ~50MB/s through
        # the axon tunnel = 3.2s against a 2.1s fold).  Point ids are < 2^24,
        # so ship 3 bytes per entry and reassemble on device; per-window async
        # puts overlap the uploads with earlier windows' fold kernels.
        idx_all = [jax.device_put(_pack24(idx_main[w]))
                   for w in range(idx_main.shape[0])]
        top_idx = jax.device_put(_pack24(idx_top_np))
        overflow = jnp.asarray(ovf_host)
    else:
        def prep(points, scalars_u16):
            points_ext = jnp.concatenate([to_rns(points), G1R.infinity((1,))], 0)
            digits = extract_digits(scalars_u16, c)
            idx_all, overflow = _slot_indices(digits[:-1], n_buckets, capacity)
            top_idx, top_o = _slot_indices(digits[-1:], trange, tcap)
            return points_ext, idx_all, top_idx[0], overflow | top_o

        points_ext, idx_all, top_idx, overflow = _pjit(
            ("prep", n, capacity, c), prep
        )(points, scalars_u16)

    fold_w = _pjit(
        ("fold", n, capacity, c, interpret),
        lambda pe, idx: _fold_buckets_pallas(
            G1R, pe, _maybe_unpack(idx), interpret=interpret
        ),
    )
    n_main = len(idx_all) if isinstance(idx_all, list) else idx_all.shape[0]
    buckets = [fold_w(points_ext, idx_all[w]) for w in range(n_main)]
    top_b = _pjit(
        ("fold", n, tcap, c, interpret, "top"),
        lambda pe, idx: _fold_buckets_pallas(
            G1R, pe, _maybe_unpack(idx), interpret=interpret
        ),
    )(points_ext, top_idx)

    def combine(buckets, top_b):
        wsums = _weighted_bucket_sum(G1R, buckets)
        top_sum = _weighted_bucket_sum(G1R, top_b[None])
        wsums = jnp.concatenate([wsums, top_sum], axis=0)
        return from_rns(_horner(G1R, wsums, c))

    out = _pjit(("combine", n_buckets, trange, c), combine)(
        jnp.stack(buckets, 0), top_b
    )
    return out, overflow


def scalars_from_int(ints):
    """Host: python-int scalars -> (n,16) canonical uint32-held 16-bit limbs."""
    from ..ff.spec import FR, int_to_limbs

    return jnp.asarray(np.stack([int_to_limbs(int(s) % FR.p) for s in ints]))


def msm_checked(points, scalars_u16, capacity: Optional[int] = None, backend="auto"):
    """Host wrapper: runs `msm`, grows capacity on bucket overflow (handles
    adversarial scalar distributions; each retry recompiles)."""
    n = points.shape[0]
    kernel = msm_rns if backend == "rns" or (backend == "auto" and n >= 4096) else msm
    cap = capacity or default_capacity(n, 1 << C_BITS)
    while True:
        out, ovf = kernel(points, scalars_u16, capacity=cap)
        if not bool(ovf):
            return out
        if cap >= max(n, 8):
            return out  # capacity covers every point; overflow impossible
        cap = min(max(n, 8), cap * 4)

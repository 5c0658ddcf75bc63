"""Pallas-fused RNS elliptic-curve ops.

Under plain XLA, one RC15 add over RNS coordinates spans ~24 dot_generals and
dozens of fusions, each round-tripping (B, 35) intermediates through HBM; the
measured rate at MSM fold shapes is ~3-7M adds/s vs ~13M/s compute-bound.
This module re-runs the exact same formula code (ec/curve.py + ff/rns_field)
INSIDE a Pallas kernel, so the whole 12-multiply chain stays in VMEM.

The kernel body literally calls CurveOps.add on a shallow-copied RnsField
whose constant tables are kernel inputs (Pallas kernels cannot capture
constants), so there is a single source of truth for the group law.
"""

from __future__ import annotations

import copy
import functools
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ec.curve import CurveOps
from ..ec.rns_g1 import FQ_RNS
from ..ff.spec import BN254_B
from ..ff import rns_packed as rpk

# constant tables the add/double path touches, in kernel-argument order
_CONST_ATTRS = [
    "MODS", "CS", "SIGMA_C", "P_B", "MINV_B", "SIGMA2_C", "M2_MOD_A",
]
_KP = 1024  # the only subtraction offset the curve formulas use


def _consts_host():
    f = FQ_RNS
    vecs = [np.asarray(getattr(f, a), np.uint32) for a in _CONST_ATTRS]
    vecs.append(np.asarray(f._kp_res(_KP), np.uint32))
    vecs.append(np.array([f.M2INV_R], np.uint32))
    return vecs + [np.asarray(f.RHS_AB), np.asarray(f.RHS_BA)]


def _ext_zero_point(self, sigma, rhs, mods, cs, nfolds: int = 3):
    """Base extension for Mosaic: the MXU int path inside Pallas only
    handles SIGNED int8 (a uint8 dot miscompiles), so shift operands by a
    zero point of 128 and correct with row/column sums (exact)."""
    from ..ff.rns_field import _split_u8

    n = rhs.shape[1] // 4
    lhs = _split_u8(sigma)
    shape = lhs.shape
    s = (lhs.astype(jnp.int32) - 128).astype(jnp.int8).reshape(-1, shape[-1])
    t = (rhs.astype(jnp.int32) - 128).astype(jnp.int8)
    st = jax.lax.dot_general(
        s, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    rows = jnp.sum(s.astype(jnp.int32), axis=1, keepdims=True)
    cols = jnp.sum(t.astype(jnp.int32), axis=0, keepdims=True)
    out = (st + 128 * rows + 128 * cols + 128 * 128 * s.shape[1]).astype(
        jnp.uint32
    ).reshape(shape[:-1] + (4 * n,))
    s_ll = out[..., 0 * n : 1 * n]
    s_lh = out[..., 1 * n : 2 * n]
    s_hl = out[..., 2 * n : 3 * n]
    s_hh = out[..., 3 * n : 4 * n]
    tt = s_ll + ((s_lh + s_hl) << 8) + cs * s_hh
    return self._fold(tt, mods, cs, nfolds)


def _kernel_field(const_refs):
    """RnsField clone whose tables live in kernel memory."""
    f2 = copy.copy(FQ_RNS)
    f2._ext = types.MethodType(_ext_zero_point, f2)
    vals = [r[:] for r in const_refs]
    for attr, v in zip(_CONST_ATTRS, vals):
        setattr(f2, attr, v.reshape(-1))
    kp = vals[len(_CONST_ATTRS)].reshape(-1)
    f2._kp_res = lambda k_p: kp  # curve formulas only ever use k_p=1024
    f2.M2INV_R = vals[len(_CONST_ATTRS) + 1].reshape(-1)[0]
    f2.RHS_AB = vals[len(_CONST_ATTRS) + 2]
    f2.RHS_BA = vals[len(_CONST_ATTRS) + 3]
    return f2




def _rc15_add_2d(F, x1, y1, z1, x2, y2, z2):
    """RC15 complete add (a=0, b=3) in pure 2D: the six independent products
    per layer are batched by ROW concatenation instead of a stacked axis.
    Formula parity with ec/curve.py CurveOps.add (tests/test_pallas.py)."""
    cat = jnp.concatenate
    n = x1.shape[0]
    l1a = cat([x1, y1, z1, F.add(x1, y1), F.add(y1, z1), F.add(x1, z1)], 0)
    l1b = cat([x2, y2, z2, F.add(x2, y2), F.add(y2, z2), F.add(x2, z2)], 0)
    m = F.mul(l1a, l1b)
    t0, t1, t2 = m[0 * n : 1 * n], m[1 * n : 2 * n], m[2 * n : 3 * n]
    t3 = F.sub(m[3 * n : 4 * n], F.add(t0, t1))
    t4 = F.sub(m[4 * n : 5 * n], F.add(t1, t2))
    ty = F.sub(m[5 * n : 6 * n], F.add(t0, t2))
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_small(t2, 3 * BN254_B)
    z3l = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    yb = F.mul_small(ty, 3 * BN254_B)
    l2a = cat([t3, t4, yb, t1m, t0_3, z3l], 0)
    l2b = cat([t1m, yb, t0_3, z3l, t3, t4], 0)
    mm = F.mul(l2a, l2b)
    x3 = F.sub(mm[0 * n : 1 * n], mm[1 * n : 2 * n])
    y3 = F.add(mm[3 * n : 4 * n], mm[2 * n : 3 * n])
    z3 = F.add(mm[5 * n : 6 * n], mm[4 * n : 5 * n])
    return x3, y3, z3


def _rc15_double_2d(F, x, y, z):
    """RC15 complete doubling in pure 2D (parity with CurveOps.double)."""
    cat = jnp.concatenate
    n = x.shape[0]
    m = F.mul(cat([y, y, z, x], 0), cat([y, z, z, y], 0))
    t0, t1, zz, xy = m[:n], m[n : 2 * n], m[2 * n : 3 * n], m[3 * n :]
    z8 = F.double(F.double(F.double(t0)))
    t2 = F.mul_small(zz, 3 * BN254_B)
    y3l = F.add(t0, t2)
    t0m = F.sub(t0, F.add(F.double(t2), t2))
    mm = F.mul(cat([t2, t1, t0m, t0m], 0), cat([z8, z8, y3l, xy], 0))
    y3 = F.add(mm[2 * n : 3 * n], mm[:n])
    x3 = F.double(mm[3 * n :])
    z3 = mm[n : 2 * n]
    return x3, y3, z3


def _binop_kernel(op_name):
    def kernel(*refs):
        *const_refs, x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r = refs
        F = _kernel_field(const_refs)
        x3, y3, z3 = _rc15_add_2d(
            F, x1r[:], y1r[:], z1r[:], x2r[:], y2r[:], z2r[:]
        )
        x3r[:], y3r[:], z3r[:] = x3, y3, z3

    return kernel


def _unop_kernel(op_name):
    def kernel(*refs):
        *const_refs, xr, yr, zr, x3r, y3r, z3r = refs
        F = _kernel_field(const_refs)
        x3, y3, z3 = _rc15_double_2d(F, xr[:], yr[:], zr[:])
        x3r[:], y3r[:], z3r[:] = x3, y3, z3

    return kernel


def _const_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(11)]


def _coord_spec(tile):
    return pl.BlockSpec((tile, 35), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _split_coords(a):
    B = a.shape[0]
    return a[:, 0, :], a[:, 1, :], a[:, 2, :]


@functools.partial(jax.jit, static_argnames=("tile",))
def add(a, b, tile: int = 256):
    """RC15 complete add on (B, 3, 35) uint16 RNS points, Pallas-fused.
    B must be a multiple of `tile` (pad upstream)."""
    B = a.shape[0]
    assert B % tile == 0, f"B={B} not a multiple of tile={tile}"
    consts = _consts_host()
    coord = jax.ShapeDtypeStruct((B, 35), jnp.uint16)
    outs = pl.pallas_call(
        _binop_kernel("add"),
        out_shape=(coord, coord, coord),
        grid=(B // tile,),
        in_specs=_const_specs() + [_coord_spec(tile)] * 6,
        out_specs=(_coord_spec(tile),) * 3,
    )(*consts, *_split_coords(a), *_split_coords(b))
    return jnp.stack(outs, axis=1)


def _rc15_add_nocat(F, x1, y1, z1, x2, y2, z2):
    """RC15 complete add with per-product field muls (no row concatenation):
    Mosaic's concatenate can't fuse large odd-sized i16 vectors with offset
    layouts, and at fold row counts each product is already wide enough to
    saturate the units.  Same math as _rc15_add_2d/CurveOps.add."""
    t0 = F.mul(x1, x2)
    t1 = F.mul(y1, y2)
    t2 = F.mul(z1, z2)
    t3 = F.sub(F.mul(F.add(x1, y1), F.add(x2, y2)), F.add(t0, t1))
    t4 = F.sub(F.mul(F.add(y1, z1), F.add(y2, z2)), F.add(t1, t2))
    ty = F.sub(F.mul(F.add(x1, z1), F.add(x2, z2)), F.add(t0, t2))
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_small(t2, 3 * BN254_B)
    z3l = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    yb = F.mul_small(ty, 3 * BN254_B)
    x3 = F.sub(F.mul(t3, t1m), F.mul(t4, yb))
    y3 = F.add(F.mul(t1m, z3l), F.mul(yb, t0_3))
    z3 = F.add(F.mul(z3l, t4), F.mul(t0_3, t3))
    return x3, y3, z3


def _fold_level_kernel(bb: int, w: int, K: int, L: int = 35):
    """One K-way fold level: block (bb, w, 105) -> (bb, w//K, 105) with the
    K-slot tree (log2 K unrolled add layers) entirely in VMEM."""

    def kernel(*refs):
        *const_refs, mat_ref, out_ref = refs
        F = _kernel_field(const_refs)
        buf = mat_ref[:]  # (bb, w, 105)
        g = w // K
        cs = [buf[..., i * L : (i + 1) * L].reshape(bb * g, K, L) for i in range(3)]
        width = K
        while width > 1:
            half = width // 2
            lo = [c[:, :half].reshape(-1, L) for c in cs]
            hi = [c[:, half : 2 * half].reshape(-1, L) for c in cs]
            cs = [
                c.reshape(bb * g, half, L)
                for c in _rc15_add_nocat(F, *lo, *hi)
            ]
            width = half
        out_ref[:] = jnp.concatenate(
            [c.reshape(bb, g, L) for c in cs], axis=-1
        )

    return kernel


def _pallas_fold_level(mat, K: int, interpret: bool = False):
    """(NB, w, 105) -> (NB, w/K, 105); w must be a multiple of K."""
    NB, w, FL = mat.shape
    g = w // K
    assert g * K == w
    bb = max(1, min(NB, 3_500_000 // max(1, w * 210)))
    while NB % bb:
        bb -= 1
    consts = _consts_host()
    out = pl.pallas_call(
        _fold_level_kernel(bb, w, K),
        out_shape=jax.ShapeDtypeStruct((NB, g, FL), jnp.uint16),
        grid=(NB // bb,),
        in_specs=_const_specs()
        + [pl.BlockSpec((bb, w, FL), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, g, FL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, mat)
    return out


def fold_buckets_chunked(mat, identity_row, K: int = 8,
                         interpret: bool = False):
    """(NB, cap, 105) u16 flat RNS bucket matrices -> (NB, 105) bucket sums,
    as a chain of small K-way Pallas fold levels (each level's tree runs in
    VMEM; between levels the array shrinks Kx, so HBM traffic is a geometric
    tail).  A single whole-tree kernel is NOT viable: its unrolled ~12-level
    Mosaic program killed the remote compile service outright.

    identity_row: (105,) u16 — the RNS-Montgomery (0:1:0) used to pad widths
    to a multiple of K."""
    # the in-kernel tree halves `width` each layer (lo=[:half], hi=[half:2h])
    # and would silently DROP the tail slot for non-power-of-two K
    assert K >= 2 and (K & (K - 1)) == 0, f"K={K} must be a power of two"
    NB, cap, FL = mat.shape
    w = cap
    while w > 1:
        pad = (-w) % K
        if pad:
            fill = jnp.broadcast_to(identity_row, (NB, pad, FL))
            mat = jnp.concatenate([mat, fill], axis=1)
            w += pad
        mat = _pallas_fold_level(mat, K, interpret=interpret)
        w //= K
    return mat[:, 0]


def _halving_fold_kernel(bb: int, w: int, layers: int, L: int = 35):
    """`layers` halving tree layers entirely in VMEM with NO in-kernel
    reshape/concatenate: coordinates are sliced from the last dim (x|y|z at
    35-lane offsets), lo/hi are contiguous slices of the middle dim, and the
    three output coordinates are written back as separate stores.  Mosaic
    compiles the reshape-based variant (_fold_level_kernel) in unbounded
    time at w ~ 4.6k (the (bb, w, 105) -> (bb*g, K, 105) relayout unrolls);
    this shape-preserving form compiles in seconds at any width.

    Block (bb, w, 105) -> (bb, w >> layers, 105); w must be divisible by
    2**layers (pad with the identity upstream)."""
    assert w % (1 << layers) == 0

    def kernel(*refs):
        *const_refs, mat_ref, out_ref = refs
        F = _kernel_field(const_refs)
        cs = [mat_ref[:, :, i * L : (i + 1) * L] for i in range(3)]
        width = w
        for _ in range(layers):
            half = width // 2
            lo = [c[:, :half] for c in cs]
            hi = [c[:, half : 2 * half] for c in cs]
            cs = list(_rc15_add_nocat(F, *lo, *hi))
            width = half
        for i in range(3):
            out_ref[:, :, i * L : (i + 1) * L] = cs[i]

    return kernel


def _pallas_fold_halving(mat, layers: int, interpret: bool = False,
                         vmem_budget: int = 3_500_000):
    """(NB, w, 105) -> (NB, w >> layers, 105); w % 2**layers == 0."""
    NB, w, FL = mat.shape
    g = w >> layers
    assert g << layers == w
    bb = max(1, min(NB, vmem_budget // max(1, w * 2 * FL)))
    while NB % bb:
        bb -= 1
    consts = _consts_host()
    return pl.pallas_call(
        _halving_fold_kernel(bb, w, layers),
        out_shape=jax.ShapeDtypeStruct((NB, g, FL), jnp.uint16),
        grid=(NB // bb,),
        in_specs=_const_specs()
        + [pl.BlockSpec((bb, w, FL), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, g, FL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, mat)


# ---------------------------------------------------------------- packed fold
#
# The packed kernel runs the RC15 add on full (rows, 105) x|y|z lane-packed
# rows (ff/rns_packed.py): 82% lane utilization vs 27% for per-coordinate
# (rows, 35) slices, and 4 packed Montgomery muls per add instead of 12.
# The fold data layout is ALREADY packed (the driver's flat 105-wide rows),
# so only the kernel body changes.

_PACKED_CONST_ATTRS = [
    "MODS", "CS", "SIGMA_F", "P_B_F", "MINV_B_F", "SIGMA2_F", "M2_MOD_A_F",
    "KP1024", "P2OFF", "RHS_AB", "RHS_BA", "SPREAD",
]
_PACKED_2D_ATTRS = ("RHS_AB", "RHS_BA", "SPREAD")


def _packed_consts_host():
    from ..ff import FQ

    f = rpk.get_packed_field(FQ)
    vecs = []
    for a in _PACKED_CONST_ATTRS:
        v = np.asarray(getattr(f, a))
        if a in ("RHS_AB", "RHS_BA"):
            # pre-shift the zero-point adjusted rhs to int8 and fold its
            # column sums into one additive constant: Mosaic does NOT hoist
            # the per-call (210,420) adjust+colsum out of the kernel loop
            # (measured: the ext path was 37% of the fold kernel)
            t8 = (v.astype(np.int32) - 128).astype(np.int8)
            coloff = (
                128 * t8.astype(np.int32).sum(axis=0, keepdims=True)
                + 128 * 128 * v.shape[0]
            ).astype(np.int32)
            vecs.append(t8)
            vecs.append(coloff)
        else:
            vecs.append(v)
    vecs.append(np.array([f.M2INV_R], np.uint32))
    return vecs


def _ext_zero_point_packed(self, sigma, rhs_pair, nfolds: int = 3):
    """Packed base extension for Mosaic: signed-int8 MXU with zero-point 128
    correction (exact).  rhs_pair = (pre-shifted int8 rhs, additive column
    offset int32 (1, 420)) — both host-precomputed (see _packed_consts_host)."""
    from ..ff.rns_field import _split_u8

    t, coloff = rhs_pair
    lhs = _split_u8(sigma)
    shape = lhs.shape
    s = (lhs.astype(jnp.int32) - 128).astype(jnp.int8).reshape(-1, shape[-1])
    st = jax.lax.dot_general(
        s, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    rows = jnp.sum(s.astype(jnp.int32), axis=1, keepdims=True)
    out = (st + 128 * rows + coloff).astype(jnp.uint32).reshape(
        shape[:-1] + (4 * rpk.NPK,)
    )
    N = rpk.NPK
    s_ll = out[..., 0 * N : 1 * N]
    s_lh = out[..., 1 * N : 2 * N]
    s_hl = out[..., 2 * N : 3 * N]
    s_hh = out[..., 3 * N : 4 * N]
    tt = s_ll + ((s_lh + s_hl) << 8) + self.CS * s_hh
    return self._fold(tt, nfolds)


def _roll_pltpu(self, v, shift: int):
    """Static lane roll as slice+concat: Mosaic lowers this far better than
    tpu.dynamic_rotate (measured 0.089s vs 0.130s per window fold — rotates
    were 45% of the packed kernel).  MSM_ROLL_ROTATE=1 reverts to
    pltpu.roll (which only rotates 32-bit lanes, hence the widening)."""
    if os.environ.get("MSM_ROLL_ROTATE", "0") in ("", "0"):
        n = v.shape[-1]
        s = shift % n
        return jnp.concatenate([v[..., n - s :], v[..., : n - s]], axis=-1)
    if v.dtype.itemsize < 4:
        wide = pltpu.roll(v.astype(jnp.uint32), shift % v.shape[-1],
                          axis=v.ndim - 1)
        return wide.astype(v.dtype)
    return pltpu.roll(v, shift % v.shape[-1], axis=v.ndim - 1)


def _kernel_field_packed(const_refs):
    """PackedRnsField clone whose tables live in kernel memory and whose
    ext/roll/masks use Mosaic-safe forms."""
    from ..ff import FQ

    f2 = copy.copy(rpk.get_packed_field(FQ))
    f2._ext = types.MethodType(_ext_zero_point_packed, f2)
    f2._roll = types.MethodType(_roll_pltpu, f2)
    # NOTE: store stays uint16 — measured: u32-resident chaining is 5% SLOWER
    # (Mosaic fuses the u16<->u32 converts; wider residents cost VMEM traffic)
    probe = os.environ.get("MSM_KERNEL_PROBE", "")
    if probe == "noext":
        f2._ext = types.MethodType(
            lambda self, sigma, rhs, nfolds=3: self._fold(sigma, 2), f2)
    elif probe == "noroll":
        f2._roll = types.MethodType(lambda self, v, s: v, f2)
    elif probe == "nomul":
        f2.mul_lazy = types.MethodType(
            lambda self, a, b: a.astype(jnp.uint32), f2)
    vals = [r[:] for r in const_refs]
    it = iter(vals)
    for attr in _PACKED_CONST_ATTRS:
        if attr in ("RHS_AB", "RHS_BA"):
            setattr(f2, attr, (next(it), next(it)))  # (int8 rhs, col offset)
        elif attr in _PACKED_2D_ATTRS:
            setattr(f2, attr, next(it))
        else:
            setattr(f2, attr, next(it).reshape(-1))
    f2.M2INV_R = next(it).reshape(-1)[0]
    # lane masks from 2D iota (Mosaic needs >=2D iota); broadcast over rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, rpk.NPK), 1)
    f2.IS_A = (lane % rpk.SEG) < rpk.K
    f2.IS_R = (lane % rpk.SEG) == 2 * rpk.K
    f2.IS_X = lane < rpk.SEG
    f2.IS_Y = (lane >= rpk.SEG) & (lane < 2 * rpk.SEG)
    return f2


def _packed_const_specs():
    # +1 for M2INV_R, +2 for the (rhs, coloff) pair expansion of each RHS
    return [pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in range(len(_PACKED_CONST_ATTRS) + 3)]


def _halving_fold_kernel_2d_pk(wb: int, layers: int):
    """`layers` halving layers on a 2D (wb, 105) block with the PACKED RC15
    add — whole rows, no per-coordinate slicing."""

    def kernel(*refs):
        *const_refs, mat_ref, out_ref = refs
        F = _kernel_field_packed(const_refs)
        v = mat_ref[:]  # (wb, 105) u16 in HBM; u32-resident across layers
        width = wb
        for _ in range(layers):
            half = width // 2
            v = rpk.add_packed(F, v[:half], v[half : 2 * half])
            width = half
        out_ref[:] = v.astype(jnp.uint16)

    return kernel


def _pallas_fold_grid2d_pk(mat, wb: int, layers: int, interpret: bool = False):
    """Packed twin of _pallas_fold_grid2d: (NB, w, 105) ->
    (NB, (w/wb)*(wb>>layers), 105) with 2D blocks and the packed add."""
    NB, w, FL = mat.shape
    assert w % wb == 0 and FL == rpk.NPK
    g = wb >> layers
    consts = _packed_consts_host()
    return pl.pallas_call(
        _halving_fold_kernel_2d_pk(wb, layers),
        out_shape=jax.ShapeDtypeStruct((NB, (w // wb) * g, FL), jnp.uint16),
        grid=(NB, w // wb),
        in_specs=_packed_const_specs()
        + [pl.BlockSpec((None, wb, FL), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, g, FL), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, mat)


def fold_buckets_grid_pk(mat, identity_row, wb: int = 512, layers: int = 4,
                         interpret: bool = False):
    """Packed twin of fold_buckets_grid (same level walk, packed kernel)."""
    NB, cap, FL = mat.shape
    w = cap
    while w > 1:
        if w >= wb:
            pad = (-w) % wb
            if pad:
                fill = jnp.broadcast_to(identity_row, (NB, pad, FL))
                mat = jnp.concatenate([mat, fill], axis=1)
                w += pad
            mat = _pallas_fold_grid2d_pk(mat, wb, layers, interpret=interpret)
            w = (w // wb) * (wb >> layers)
        else:
            lyr = min(layers, (w - 1).bit_length())
            step = 1 << lyr
            pad = (-w) % step
            if pad:
                fill = jnp.broadcast_to(identity_row, (NB, pad, FL))
                mat = jnp.concatenate([mat, fill], axis=1)
                w += pad
            mat = _pallas_fold_grid2d_pk(mat, w, lyr, interpret=interpret)
            w >>= lyr
    return mat[:, 0]


def _halving_fold_kernel_2d(wb: int, layers: int, L: int = 35):
    """`layers` halving layers on a 2D (wb, 105) block — the same shape
    profile as the production `add` kernel (which Mosaic compiles in
    seconds, vs 3D (bb, w, 105) blocks which stall its compiler for tens of
    minutes at ANY size; measured round 3)."""

    def kernel(*refs):
        *const_refs, mat_ref, out_ref = refs
        F = _kernel_field(const_refs)
        cs = [mat_ref[:, i * L : (i + 1) * L] for i in range(3)]
        width = wb
        for _ in range(layers):
            half = width // 2
            lo = [c[:half] for c in cs]
            hi = [c[half : 2 * half] for c in cs]
            cs = list(_rc15_add_nocat(F, *lo, *hi))
            width = half
        for i in range(3):
            out_ref[:, i * L : (i + 1) * L] = cs[i]

    return kernel


def _pallas_fold_grid2d(mat, wb: int, layers: int, interpret: bool = False):
    """(NB, w, 105) -> (NB, (w/wb)*(wb>>layers), 105); 2D blocks, one grid
    step per (bucket, width-chunk)."""
    NB, w, FL = mat.shape
    assert w % wb == 0
    g = wb >> layers
    consts = _consts_host()
    return pl.pallas_call(
        _halving_fold_kernel_2d(wb, layers),
        out_shape=jax.ShapeDtypeStruct((NB, (w // wb) * g, FL), jnp.uint16),
        grid=(NB, w // wb),
        in_specs=_const_specs()
        + [pl.BlockSpec((None, wb, FL), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, g, FL), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, mat)


def _pallas_fold_grid(mat, wb: int, layers: int, interpret: bool = False,
                      vmem_budget: int = 3_000_000):
    """(NB, w, 105) -> (NB, (w/wb)*(wb>>layers), 105) via a 2D grid over
    (buckets, width-chunks).  The kernel program has a FIXED (bb, wb, 105)
    block regardless of total width, so the remote Mosaic service compiles
    it once per (bb, wb, layers) — big-width blocks are what it cannot
    handle (measured: w~4.6k blocks never return; wb<=1024 compiles in
    seconds).  Chunk-local pairing is still a correct tree reduction:
    addition is associative and slots are identity-padded."""
    NB, w, FL = mat.shape
    assert w % wb == 0
    g = wb >> layers
    bb = max(1, min(NB, vmem_budget // max(1, wb * 2 * FL)))
    while NB % bb:
        bb -= 1
    consts = _consts_host()
    return pl.pallas_call(
        _halving_fold_kernel(bb, wb, layers),
        out_shape=jax.ShapeDtypeStruct((NB, (w // wb) * g, FL), jnp.uint16),
        grid=(NB // bb, w // wb),
        in_specs=_const_specs()
        + [pl.BlockSpec((bb, wb, FL), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, g, FL), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, mat)


def fold_buckets_grid(mat, identity_row, wb: int = 512, layers: int = 4,
                      interpret: bool = False):
    """(NB, cap, 105) u16 bucket matrices -> (NB, 105) bucket sums using the
    fixed-width grid-chunked fold: every level >= wb reuses ONE compiled
    Mosaic program; the sub-wb tail uses the small halving kernels."""
    NB, cap, FL = mat.shape
    w = cap
    while w > 1:
        if w >= wb:
            pad = (-w) % wb
            if pad:
                fill = jnp.broadcast_to(identity_row, (NB, pad, FL))
                mat = jnp.concatenate([mat, fill], axis=1)
                w += pad
            mat = _pallas_fold_grid2d(mat, wb, layers, interpret=interpret)
            w = (w // wb) * (wb >> layers)
        else:
            lyr = min(layers, (w - 1).bit_length())
            step = 1 << lyr
            pad = (-w) % step
            if pad:
                fill = jnp.broadcast_to(identity_row, (NB, pad, FL))
                mat = jnp.concatenate([mat, fill], axis=1)
                w += pad
            mat = _pallas_fold_grid2d(mat, w, lyr, interpret=interpret)
            w >>= lyr
    return mat[:, 0]


def fold_buckets_halving(mat, identity_row, layers_per_call: int = 4,
                         interpret: bool = False):
    """(NB, cap, 105) u16 bucket matrices -> (NB, 105) bucket sums via
    chained no-reshape halving kernels, `layers_per_call` tree layers per
    Mosaic program (each call shrinks the array 2^layers x)."""
    NB, cap, FL = mat.shape
    w = cap
    while w > 1:
        layers = min(layers_per_call, (w - 1).bit_length())
        step = 1 << layers
        pad = (-w) % step
        if pad:
            fill = jnp.broadcast_to(identity_row, (NB, pad, FL))
            mat = jnp.concatenate([mat, fill], axis=1)
            w += pad
        mat = _pallas_fold_halving(mat, layers, interpret=interpret)
        w >>= layers
    return mat[:, 0]


@functools.partial(jax.jit, static_argnames=("tile",))
def double(a, tile: int = 256):
    B = a.shape[0]
    assert B % tile == 0
    consts = _consts_host()
    coord = jax.ShapeDtypeStruct((B, 35), jnp.uint16)
    outs = pl.pallas_call(
        _unop_kernel("double"),
        out_shape=(coord, coord, coord),
        grid=(B // tile,),
        in_specs=_const_specs() + [_coord_spec(tile)] * 3,
        out_specs=(_coord_spec(tile),) * 3,
    )(*consts, *_split_coords(a))
    return jnp.stack(outs, axis=1)

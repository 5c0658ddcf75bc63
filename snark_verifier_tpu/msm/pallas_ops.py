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
import types

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ec.curve import CurveOps
from ..ec.rns_g1 import FQ_RNS
from ..ff.spec import BN254_B

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
    s = (lhs.astype(jnp.int32) - 128).astype(jnp.int8)
    t = (rhs.astype(jnp.int32) - 128).astype(jnp.int8)
    st = jax.lax.dot_general(
        s, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    rows = jnp.sum(s.astype(jnp.int32), axis=1, keepdims=True)
    cols = jnp.sum(t.astype(jnp.int32), axis=0, keepdims=True)
    out = (st + 128 * rows + 128 * cols + 128 * 128 * s.shape[1]).astype(
        jnp.uint32
    )
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


def _fold_kernel(bb: int, cap: int, width_lanes: int = 35):
    """Whole-tree bucket fold in VMEM: block of `bb` buckets x `cap` slots of
    flat (3*35 u16) RNS points -> one point per bucket, with every
    intermediate level resident in VMEM.  This removes the per-level HBM
    round-trips (slices/concats/copies) that made the XLA tree fold run at
    ~3.9M adds/s vs the ~15M adds/s resident add rate (PERFNOTES trace:
    reshapes 1.7s + copies 0.9s + gather overhead per 2^20 MSM)."""
    L = width_lanes

    def kernel(*refs):
        *const_refs, mat_ref, out_ref = refs
        F = _kernel_field(const_refs)
        buf = mat_ref[:]  # (bb, cap, 105)
        x = buf[..., 0 * L : 1 * L]
        y = buf[..., 1 * L : 2 * L]
        z = buf[..., 2 * L : 3 * L]
        width = cap
        while width > 1:
            half = width // 2
            flat = lambda a, lo, n: a[:, lo : lo + n].reshape(bb * n, L)
            x3, y3, z3 = _rc15_add_nocat(
                F,
                flat(x, 0, half), flat(y, 0, half), flat(z, 0, half),
                flat(x, half, half), flat(y, half, half), flat(z, half, half),
            )
            x3 = x3.reshape(bb, half, L)
            y3 = y3.reshape(bb, half, L)
            z3 = z3.reshape(bb, half, L)
            if width % 2:
                x = jnp.concatenate([x3, x[:, 2 * half : width]], 1)
                y = jnp.concatenate([y3, y[:, 2 * half : width]], 1)
                z = jnp.concatenate([z3, z[:, 2 * half : width]], 1)
            else:
                x, y, z = x3, y3, z3
            width = half + (width % 2)
        out_ref[0] = jnp.concatenate([x[:, 0], y[:, 0], z[:, 0]], axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("bb", "interpret"))
def fold_buckets(mat, bb: int = 4, interpret: bool = False):
    """(NB, cap, 105) u16 flat RNS bucket matrices -> (NB, 105) bucket sums.
    NB must be a multiple of bb.  Block VMEM footprint is bb*cap*210B —
    pick bb so that stays under ~4MB."""
    NB, cap, FL = mat.shape
    assert FL == 105 and NB % bb == 0, (mat.shape, bb)
    consts = _consts_host()
    # 3D output (grid, bb, 105) with a (1, bb, 105) block: Mosaic requires the
    # trailing two block dims to equal the array dims (105 is not 128-aligned)
    out = pl.pallas_call(
        _fold_kernel(bb, cap),
        out_shape=jax.ShapeDtypeStruct((NB // bb, bb, FL), jnp.uint16),
        grid=(NB // bb,),
        in_specs=_const_specs()
        + [pl.BlockSpec((bb, cap, FL), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bb, FL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, mat)
    return out.reshape(NB, FL)


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

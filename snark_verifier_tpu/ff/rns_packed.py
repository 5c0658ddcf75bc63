"""Lane-packed RNS field: three coordinates per 105-lane row.

The fold-phase bottleneck of the MSM is elementwise VPU work on (B, 35)
residue arrays — 35 of 128 lanes, 27% utilization (PERFNOTES round 3).  This
module runs the same Bajard/Kawamura RNS arithmetic (ff/rns_field.py) on
rows that pack all THREE projective coordinates x|y|z side by side:
(..., 105) uint16, 82% lane utilization, with per-lane constant tables tiled
3x.  Every elementwise op then does 3 coordinates' work per vector pass, and
the RC15 group law needs only 4 packed Montgomery multiplies per EC add
instead of 12 (see PackedCurve.add_packed).

Segment layout per row (35 lanes per coordinate, same residue order as
RnsField): [ x: A(17) B(17) r(1) | y: A B r | z: A B r ].

Cross-coordinate data movement uses only full-row lane ROTATIONS (cheap on
the VPU, pltpu.roll inside Pallas kernels) plus lane masks — no thin slices
or concatenates, which Mosaic handles poorly at these shapes.

The base-extension matmuls become block-diagonal: a (210, 420) uint8 rhs
whose three diagonal blocks are the per-coordinate extension matrices; rows
for non-source lanes are zero, so garbage in unused lanes of the lhs cannot
leak into the outputs.

Reference parity: same role as rns_field.py (the multiplication core the
reference gets from halo2curves — /root/reference/snark-verifier/src/lib.rs:
16-17); the packed layout is a TPU lane-utilization design with no
reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rns_field import RnsField, _pack_rhs, _split_u8, get_rns_field
from .rns_spec import K, MR, NRES, RnsSpec
from .spec import FieldSpec

_U32 = jnp.uint32
_U16 = jnp.uint16
_MASK16 = np.uint32(0xFFFF)

SEG = NRES  # 35 lanes per coordinate
NPK = 3 * SEG  # 105 lanes per packed row


def _seg_embed(vals: np.ndarray, lane0: int) -> np.ndarray:
    """(k,) values -> (105,) with the values at [lane0, lane0+k) of each
    35-lane segment, zero elsewhere."""
    out = np.zeros((NPK,), np.uint32)
    for s in range(3):
        out[s * SEG + lane0 : s * SEG + lane0 + len(vals)] = vals
    return out


def _bd_rhs(T: np.ndarray, row0: int, col0: int) -> np.ndarray:
    """Block-diagonal full-row extension matrix: T (k, n) placed at rows
    [35s+row0, +k) x cols [35s+col0, +n) of a (105, 105) matrix for each
    segment s, then byte-packed to the (210, 420) uint8 matmul rhs."""
    k, n = T.shape
    full = np.zeros((NPK, NPK), np.uint32)
    for s in range(3):
        full[s * SEG + row0 : s * SEG + row0 + k,
             s * SEG + col0 : s * SEG + col0 + n] = T
    return _pack_rhs(full)


class PackedRnsField:
    """RNS field ops over (..., 105) packed coordinate rows.

    Mirrors the RnsField op surface (add/sub/neg/mul_small/mul_lazy/
    lazy_add/lazy_sub/reduce_d/mul) with constants tiled per lane.  Lanes
    outside an op's meaningful segment positions carry garbage that later
    masked combines discard — zero rhs rows keep it out of the matmuls."""

    #: lane-rotate hook: plain XLA uses jnp.roll; Pallas kernel clones
    #: override this with pltpu.roll via types.MethodType.
    @staticmethod
    def _roll(v, shift: int):
        return jnp.roll(v, shift, axis=-1)

    #: storage dtype of op RESULTS.  uint16 halves HBM bytes at rest (the
    #: XLA path); Pallas kernel clones set uint32 so chained ops skip the
    #: u16<->u32 convert passes between every op (values are <2^16 either
    #: way — this is storage, not math).
    store = _U16

    def __init__(self, base: RnsField):
        self.base = base
        self.fspec: FieldSpec = base.fspec
        s: RnsSpec = base.rspec
        self.rspec = s
        self.MODS = np.tile(np.asarray(s.mods), 3)  # (105,)
        self.CS = np.tile(np.asarray(s.cs), 3)
        self.SIGMA_F = _seg_embed(np.asarray(s.sigma_c), 0)  # A lanes
        self.P_B_F = _seg_embed(np.asarray(s.p_mod[K:]), K)  # B|r lanes
        self.MINV_B_F = _seg_embed(np.asarray(s.minv_b), K)
        self.SIGMA2_F = _seg_embed(np.asarray(s.sigma2_c), K)  # B lanes
        self.M2_MOD_A_F = _seg_embed(np.asarray(s.m2_mod_a[:K]), 0)
        self.M2INV_R = np.uint32(s.m2inv_r)
        # A -> B|r extension: rows A lanes, cols B|r lanes
        self.RHS_AB = _bd_rhs(np.asarray(s.T_ab), 0, K)  # (210, 420)
        # B -> A|r extension: rows B lanes, cols A lanes + the r lane
        t_ba = np.asarray(s.T_ba)  # (17, 18): cols A(17) | r(1)
        full = np.zeros((NPK, NPK), np.uint32)
        for seg in range(3):
            full[seg * SEG + K : seg * SEG + 2 * K,
                 seg * SEG : seg * SEG + K] = t_ba[:, :K]
            full[seg * SEG + K : seg * SEG + 2 * K, seg * SEG + 2 * K] = t_ba[:, K]
        self.RHS_BA = _pack_rhs(full)
        self.KP1024 = np.tile(base._kp_res(1024), 3)
        v = (1 << 27) * self.fspec.p * self.fspec.p
        self.P2OFF = np.tile(
            np.array([v % int(m) for m in s.mods], dtype=np.uint32), 3
        )
        lane = np.arange(NPK)
        self.IS_A = (lane % SEG) < K  # (105,) bool
        self.IS_R = (lane % SEG) == 2 * K
        self.IS_X = lane < SEG
        self.IS_Y = (lane >= SEG) & (lane < 2 * SEG)
        # beta spread: r lane (34) of each segment -> that segment's A lanes,
        # as one int8 matmul (beta < 17 fits int8 exactly)
        spread = np.zeros((NPK, NPK), np.int8)
        for s in range(3):
            spread[s * SEG + 2 * K, s * SEG : s * SEG + K] = 1
        self.SPREAD = spread
        self.one = np.tile(np.asarray(base.one), 3)  # packed (1|1|1)
        # infinity row (0 : 1 : 0) packed — what the MSM fold pads with
        inf = np.zeros((NPK,), np.uint16)
        inf[SEG : 2 * SEG] = np.asarray(base.one)
        self.INF_ROW = inf

    # ---------------------------------------------------------- primitives

    def _fold(self, t, nfolds: int = 3):
        cs, mods = self.CS, self.MODS
        for _ in range(nfolds):
            t = (t >> 16) * cs + (t & _MASK16)
        return jnp.where(t >= mods, t - mods, t)

    def _modmul(self, x, y, nfolds: int = 3):
        return self._fold(x.astype(_U32) * y.astype(_U32), nfolds)

    def _ext(self, sigma, rhs, nfolds: int = 3):
        """Packed base extension: (..., 105) u32 -> (..., 105) u32 through
        the block-diagonal byte-packed rhs (210, 420).  Output lanes outside
        the extension's target positions are garbage (zero columns)."""
        lhs = _split_u8(sigma)
        shape = lhs.shape
        out = jax.lax.dot_general(
            lhs.reshape(-1, shape[-1]),
            rhs,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(_U32)
        out = out.reshape(shape[:-1] + (4 * NPK,))
        s_ll = out[..., 0 * NPK : 1 * NPK]
        s_lh = out[..., 1 * NPK : 2 * NPK]
        s_hl = out[..., 2 * NPK : 3 * NPK]
        s_hh = out[..., 3 * NPK : 4 * NPK]
        t = s_ll + ((s_lh + s_hl) << 8) + self.CS * s_hh
        return self._fold(t, nfolds)

    # ---------------------------------------------------------- arithmetic

    def add(self, a, b):
        t = a.astype(_U32) + b.astype(_U32)
        return jnp.where(t >= self.MODS, t - self.MODS, t).astype(self.store)

    def sub(self, a, b):
        t = a.astype(_U32) + self.KP1024 + (self.MODS - b.astype(_U32))
        t = jnp.where(t >= self.MODS, t - self.MODS, t)
        return jnp.where(t >= self.MODS, t - self.MODS, t).astype(self.store)

    def neg(self, a):
        t = self.KP1024 + (self.MODS - a.astype(_U32))
        return jnp.where(t >= self.MODS, t - self.MODS, t).astype(self.store)

    def mul_small(self, a, k: int):
        acc = a
        for bit in bin(k)[3:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def double(self, a):
        return self.add(a, a)

    def mul_lazy(self, a, b):
        return self._modmul(a.astype(_U32), b.astype(_U32))

    def lazy_add(self, d1, d2):
        t = d1 + d2
        return jnp.where(t >= self.MODS, t - self.MODS, t)

    def lazy_sub(self, d1, d2):
        t = d1 + self.P2OFF + (self.MODS - d2)
        t = jnp.where(t >= self.MODS, t - self.MODS, t)
        return jnp.where(t >= self.MODS, t - self.MODS, t)

    def mul(self, a, b):
        return self.reduce_d(self.mul_lazy(a, b))

    def reduce_d(self, d):
        """Packed Montgomery reduction — same Bajard/Kawamura pipeline as
        RnsField.reduce_d, all segments in parallel, full-width ops only.
        The Shenoy-Kumaresan beta (one scalar per coordinate, living at the
        redundant lane) is spread across its segment's A lanes with a
        6-rotate OR-doubling broadcast instead of a slice."""
        d = d.astype(_U32)
        sigma = self._modmul(d, self.SIGMA_F, 2)  # valid: A lanes
        q = self._ext(sigma, self.RHS_AB, 3)  # valid: B|r lanes
        t = self._modmul(q, self.P_B_F, 3)
        s = d + t
        s = jnp.where(s >= self.MODS, s - self.MODS, s)
        r_br = self._modmul(s, self.MINV_B_F, 3)  # valid: B|r lanes
        sigma2 = self._modmul(r_br, self.SIGMA2_F, 3)  # valid: B lanes
        e = self._ext(sigma2, self.RHS_BA, 2)  # valid: A lanes + r lane
        beta = ((e + np.uint32(MR) - r_br) & _MASK16) * self.M2INV_R & _MASK16
        beta = jnp.where(self.IS_R, beta, 0)  # exact integer < 17 at r lanes
        # broadcast each segment's r-lane beta to its A lanes [0, 17) with
        # one int8 MXU matmul (the 6-rotate OR-doubling alternative costs
        # ~6 lane rotates per reduce — measured slower)
        b8 = beta.astype(jnp.int8)
        shape = b8.shape
        b = jax.lax.dot_general(
            b8.reshape(-1, NPK), self.SPREAD, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(_U32).reshape(shape)
        corr = self._fold(b * self.M2_MOD_A_F, 2)
        t2 = e + (self.MODS - corr)
        r_a = jnp.where(t2 >= self.MODS, t2 - self.MODS, t2)
        return jnp.where(self.IS_A, r_a, r_br).astype(self.store)

    # --------------------------------------------------------- conversions

    def pack(self, pt):
        """(..., 3, 35) RNS point -> (..., 105) packed row."""
        return pt.reshape(pt.shape[:-2] + (NPK,))

    def unpack(self, row):
        """(..., 105) packed row -> (..., 3, 35) RNS point."""
        return row.reshape(row.shape[:-1] + (3, SEG))


# --------------------------------------------------------------- group law


def add_packed(F: PackedRnsField, p1, p2):
    """RC15 complete add (a=0, b=3) on packed (..., 105) rows: 4 packed
    Montgomery multiplies + 3 packed reductions, vs 12 + 9 lane-equivalent
    passes for the unpacked formula (ec/curve.py CurveOps.add_xyz — same
    math, same value bounds, bit-identical residues; tests/test_packed.py).

    Derivation of the packed operands (R = rotate segments y|z|x into x|y|z
    position, i.e. roll(-35); Rp = roll(+35) giving z|x|y):
      m  = p1*p2                  = t0 | t1 | t2
      s3 = sA1*sA2 - (m + R(m))   = t3 | t4 | ty
      layer-2 products needed:  x3 = t3*t1m - t4*yb
                                y3 = t1m*z3l + yb*t0_3
                                z3 = z3l*t4 + t0_3*t3
      A1 = t3 |t1m|z3l, B1 = t1m|z3l|t4 ; A2 = t4 |yb |t0_3, B2 = yb|t0_3|t3
    with t1m = t1 - 9*t2, z3l = t1 + 9*t2, yb = 9*ty, t0_3 = 3*t0 assembled
    from rotations of m, 9*m, 3*m and 9*s3 under lane masks."""
    R = lambda v: F._roll(v, -SEG)  # noqa: E731
    Rp = lambda v: F._roll(v, SEG)  # noqa: E731
    is_x, is_y = F.IS_X, F.IS_Y

    def sel3(vx, vy, vz):
        return jnp.where(is_x, vx, jnp.where(is_y, vy, vz))

    sA1 = F.add(p1, R(p1))  # x1+y1 | y1+z1 | z1+x1
    sA2 = F.add(p2, R(p2))
    m = F.mul(p1, p2)  # t0 | t1 | t2
    mm = F.mul(sA1, sA2)
    s3 = F.sub(mm, F.add(m, R(m)))  # t3 | t4 | ty
    m9 = F.mul_small(m, 9)  # 9t0 | 9t1 | 9t2   (t2b = m9.z)
    s9 = F.mul_small(s3, 9)  # .z = yb
    m3 = F.mul_small(m, 3)  # .x = t0_3
    Rm, Rpm = R(m), Rp(m)
    Rm9, Rpm9 = R(m9), Rp(m9)
    a1 = sel3(s3, F.sub(m, Rm9), F.add(Rpm, m9))  # t3 | t1m | z3l
    b1 = sel3(F.sub(Rm, Rpm9), F.add(m, Rm9), Rp(s3))  # t1m | z3l | t4
    a2 = R(sel3(m3, s3, s9))  # t4 | yb | t0_3
    b2 = sel3(Rp(s9), Rp(m3), R(s3))  # yb | t0_3 | t3
    dA = F.mul_lazy(a1, b1)
    dB = F.mul_lazy(a2, b2)
    comb = jnp.where(is_x, F.lazy_sub(dA, dB), F.lazy_add(dA, dB))
    return F.reduce_d(comb)


@functools.lru_cache(maxsize=None)
def get_packed_field(spec: FieldSpec) -> PackedRnsField:
    return PackedRnsField(get_rns_field(spec))

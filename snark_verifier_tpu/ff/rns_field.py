"""RNS field arithmetic: the MXU-era replacement for the CIOS limb core.

See rns_spec.py for the number theory and parameter layout.  An element is a
uint32 array of shape (..., 35): 17 base-A residues | 17 base-B residues |
one redundant residue mod 2^16.  All residues are kept strictly reduced
(< m_j); represented VALUES are tracked by static bounds (documented per op;
verified by tests/test_rns.py's bound tracker).

Performance model (measured on TPU v5e, benchmarks/micro_prims.py):
  * 16-bit modmul chains run at ~88G/s on the VPU; a field mul needs ~125
    of them -> ~0.5-0.7G field-muls/s compute bound, ~15-30x the CIOS core.
  * The two base-extension matmuls ride the MXU (uint8 planes, int32
    accumulation, shared weights), off the VPU's critical path.

Reference parity: replaces the Montgomery arithmetic the reference gets from
halo2curves (re-exported at /root/reference/snark-verifier/src/lib.rs:16-17);
the RNS design itself is TPU-native (Bajard/Kawamura Cox-Rower adapted to
MXU matmul base extension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rns_spec import K, MR, NRES, RnsSpec, spec_for
from .spec import NLIMBS, FieldSpec

_U32 = jnp.uint32
_U16 = jnp.uint16
# numpy scalars (not jnp): jnp scalars are device constants that Pallas
# kernels cannot capture; numpy scalars inline as literals everywhere.
_MASK16 = np.uint32(0xFFFF)


def _split_u8(x):
    """(..., k) u32 values < 2^16 -> (..., 2k) uint8 [lo | hi]."""
    lo = (x & np.uint32(0xFF)).astype(jnp.uint8)
    hi = (x >> 8).astype(jnp.uint8)
    return jnp.concatenate([lo, hi], axis=-1)


def _pack_rhs(T: np.ndarray) -> np.ndarray:
    """(k, n) uint32 matrix (<2^16) -> (2k, 4n) uint8 4-block byte matrix.

    With lhs = [x_lo | x_hi], the int32 matmul output splits into 4 column
    blocks S_ll, S_lh, S_hl, S_hh whose weighted sum recombines x @ T."""
    k, n = T.shape
    lo = (T & 0xFF).astype(np.uint8)
    hi = (T >> 8).astype(np.uint8)
    rhs = np.zeros((2 * k, 4 * n), dtype=np.uint8)
    rhs[:k, 0 * n : 1 * n] = lo
    rhs[:k, 1 * n : 2 * n] = hi
    rhs[k:, 2 * n : 3 * n] = lo
    rhs[k:, 3 * n : 4 * n] = hi
    return rhs


class RnsField:
    """Field ops over (..., 35) RNS residue arrays (M-Montgomery form).

    Storage dtype is uint16 (residues are < 2^16 by invariant): at MSM scale
    the arrays are HBM-resident and bytes are the bottleneck.  Compute
    happens in uint32 (products need 32 bits); the boundary converts fuse
    away inside XLA kernels."""

    def __init__(self, spec: FieldSpec):
        self.fspec = spec
        s: RnsSpec = spec_for(spec)
        self.rspec = s
        # All constants are NUMPY arrays on purpose: this singleton may be
        # first constructed inside a jit trace, and any jnp op here would
        # produce tracers that the lru_cache then leaks across traces.
        self.MODS = np.asarray(s.mods)  # (35,)
        self.CS = np.asarray(s.cs)  # (35,)
        self.SIGMA_C = np.asarray(s.sigma_c)  # (17,) A
        self.P_B = np.asarray(s.p_mod[K : 2 * K + 1])  # (18,) B∪r
        self.MINV_B = np.asarray(s.minv_b)  # (18,)
        self.SIGMA2_C = np.asarray(s.sigma2_c)  # (17,) B
        self.M2_MOD_A = np.asarray(s.m2_mod_a[:K])  # (17,)
        self.M2INV_R = np.uint32(s.m2inv_r)
        self.RHS_AB = _pack_rhs(s.T_ab)  # (34, 72)
        self.RHS_BA = _pack_rhs(s.T_ba)  # (34, 72)
        self.RHS_LIMBS = _pack_rhs(s.pow_limbs)  # (32, 140)
        self.TO_RNS = np.asarray(s.to_rns_const)  # (35,)
        self.FROM_RNS = np.asarray(s.from_rns_const)  # (35,)
        self.one = np.asarray(s.one_m, dtype=np.uint16)  # M mod p: M-form "1"
        self.zero = np.zeros((NRES,), np.uint16)
        # positional reconstruction constants
        self.RHS_REC = _pack_rhs(s.m2_over)  # rows: B lanes, cols: limbs
        self.M2_LIMBS = np.asarray(s.m2_limbs)  # (17,)
        # k*p as 18 16-bit limbs, for the final conditional subtracts
        # (handles values up to 2048p — see the bound analysis in mul/sub)
        kp = []
        for sh in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            v = sh * spec.p
            kp.append([(v >> (16 * l)) & 0xFFFF for l in range(18)])
        self.KP_LIMBS = np.array(kp, dtype=np.uint32)

    # ------------------------------------------------------------- primitives

    def _fold(self, t, mods, cs, nfolds: int = 3):
        """t (u32, any value) -> t mod m, for pseudo-Mersenne m = 2^16 - c.
        Folds bring t under 2*m_min; one conditional subtract finishes.  For
        c < 2^9 (base B) three folds are needed (2^32 -> 2^25.1 -> 2^18.4 ->
        2^16.1); base A's moduli all have c < 2^8, where two suffice
        (2^32 -> 2^24.01 -> 130560 < 2*m_min).  The redundant lane (c=0,
        m=2^16) reduces to t & 0xFFFF for free."""
        for _ in range(nfolds):
            t = (t >> 16) * cs + (t & _MASK16)
        return jnp.where(t >= mods, t - mods, t)

    def _modmul(self, x, y, mods, cs, nfolds: int = 3):
        return self._fold(x.astype(_U32) * y.astype(_U32), mods, cs, nfolds)

    def _ext(self, sigma, rhs, mods, cs, nfolds: int = 3):
        """Base extension Σ_i sigma_i * T[i,j] mod m_j as one uint8 matmul.

        sigma: (..., 17) u32 < 2^16.  rhs: packed (34, 4n) uint8.  Returns
        (..., n) u32 residues (strictly reduced).  The recombined column sum
        is < 2^30, so nfolds=2 is exact whenever all target c < 2^8
        ((2^30 >> 16)*c + 2^16 < 2^22.1 -> fold2 < 2*m_min)."""
        n = rhs.shape[1] // 4
        lhs = _split_u8(sigma)
        shape = lhs.shape
        out = jax.lax.dot_general(
            lhs.reshape(-1, shape[-1]),
            rhs,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(_U32)
        out = out.reshape(shape[:-1] + (4 * n,))
        s_ll = out[..., 0 * n : 1 * n]
        s_lh = out[..., 1 * n : 2 * n]
        s_hl = out[..., 2 * n : 3 * n]
        s_hh = out[..., 3 * n : 4 * n]
        # Σ = s_ll + 2^8 (s_lh + s_hl) + 2^16 s_hh;  2^16 ≡ c (mod m).
        # Blocks < 17*255*255 < 2^20.1 so everything below stays in u32.
        t = s_ll + ((s_lh + s_hl) << 8) + cs * s_hh
        return self._fold(t, mods, cs, nfolds)

    # ------------------------------------------------------------ arithmetic

    def add(self, a, b):
        """Value bound: bound(a) + bound(b)."""
        t = a.astype(_U32) + b.astype(_U32)
        return jnp.where(t >= self.MODS, t - self.MODS, t).astype(_U16)

    def sub(self, a, b, k_p: int = 1024):
        """a - b + k_p * p (residue-exact; value bound: bound(a) + k_p*p).
        k_p*p must exceed bound(b); 1024p covers every formula in this repo —
        the worst chain is RC15 doubling's Y² − 9bZ² at its coordinate-bound
        fixed point (~920p).  tests/test_rns.py replays the formulas over
        bounds to prove closure."""
        kp = self._kp_res(k_p)
        t = a.astype(_U32) + kp + (self.MODS - b.astype(_U32))  # < 3 * 2^16
        t = jnp.where(t >= self.MODS, t - self.MODS, t)
        return jnp.where(t >= self.MODS, t - self.MODS, t).astype(_U16)

    @functools.lru_cache(maxsize=None)
    def _kp_res(self, k_p: int):
        # numpy (not jnp): a jnp constant materialized under a jit trace is a
        # tracer, and caching it across traces leaks.  numpy promotes at use.
        v = k_p * self.fspec.p
        return np.array([v % int(m) for m in self.rspec.mods], dtype=np.uint32)

    def neg(self, a, k_p: int = 1024):
        kp = self._kp_res(k_p)
        t = kp + (self.MODS - a.astype(_U32))
        return jnp.where(t >= self.MODS, t - self.MODS, t).astype(_U16)

    def mul_small(self, a, k: int):
        if k == 0:
            return jnp.broadcast_to(self.zero, a.shape)
        acc = a
        for bit in bin(k)[3:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def mul_lazy(self, a, b):
        """Product residues WITHOUT Montgomery reduction: a (..., 35) x
        b -> d (..., 35) strict residues representing the integer a*b.
        Lazy d's may be combined with lazy_add/lazy_sub before one shared
        reduce_d — RC15's x3 = t3*t1m - t4*yb needs one reduction, not two."""
        # One full-width modmul (3 folds): splitting the d phase per base to
        # exploit base A's 2-fold reduction forces minor-axis relayout
        # copies that cost more than the fold it saves (measured -10%).
        return self._modmul(a.astype(_U32), b.astype(_U32), self.MODS, self.CS)

    def lazy_add(self, d1, d2):
        t = d1 + d2
        return jnp.where(t >= self.MODS, t - self.MODS, t)

    def lazy_sub(self, d1, d2):
        """d1 - d2 + 2^27 * p^2 (the offset covers any product of curve
        values, which stay < ~2^11 p each)."""
        off = self._p2_off
        t = d1 + off + (self.MODS - d2)
        t = jnp.where(t >= self.MODS, t - self.MODS, t)
        return jnp.where(t >= self.MODS, t - self.MODS, t)

    def lazy_double(self, d):
        return self.lazy_add(d, d)

    @functools.cached_property
    def _p2_off(self):
        v = (1 << 27) * self.fspec.p * self.fspec.p
        return np.array([v % int(m) for m in self.rspec.mods], dtype=np.uint32)

    def mul(self, a, b):
        """Montgomery-RNS product a*b*M^{-1}.

        Input values may be as large as ~2^270 (≈ 2^16 * p each, jointly
        a*b < M*(M2 - 17p)); output value < a*b/M + 17p — i.e. < 18p for any
        sane inputs.  Residues strictly reduced."""
        return self.reduce_d(self.mul_lazy(a, b))

    def reduce_d(self, d):
        """Montgomery reduction of product residues: value(d) -> value(d)/M
        (mod p), bounded by value(d)/M + 17p (< ~600p for lazy-combined
        curve products, < 18p for plain muls)."""
        MODS, CS = self.MODS, self.CS
        d = d.astype(_U32)
        d_a, d_br = d[..., :K], d[..., K:]
        mods_a, cs_a = MODS[:K], CS[:K]
        mods_br, cs_br = MODS[K:], CS[K:]

        # q~ = d * (-p)^{-1} mod M, via per-lane sigma then A -> B∪r extension
        sigma = self._modmul(d_a, self.SIGMA_C, mods_a, cs_a, 2)
        q_br = self._ext(sigma, self.RHS_AB, mods_br, cs_br)  # (..., 18)

        # r~ = (d + q~ * p) * M^{-1}, elementwise in B ∪ r
        t = self._modmul(q_br, self.P_B, mods_br, cs_br)
        s = d_br + t
        s = jnp.where(s >= mods_br, s - mods_br, s)
        r_br = self._modmul(s, self.MINV_B, mods_br, cs_br)  # (..., 18)

        # exact Shenoy-Kumaresan extension B -> A using the redundant lane
        sigma2 = self._modmul(r_br[..., :K], self.SIGMA2_C, MODS[K : 2 * K], CS[K : 2 * K])
        e = self._ext(sigma2, self.RHS_BA, jnp.concatenate([MODS[:K], MODS[2 * K :]]),
                      jnp.concatenate([CS[:K], CS[2 * K :]]), nfolds=2)  # A | r
        e_a, e_r = e[..., :K], e[..., K]
        beta = ((e_r + np.uint32(MR) - r_br[..., K]) & _MASK16) * self.M2INV_R & _MASK16
        # r~_A = e_A - beta * (M2 mod m_i)   (beta < 17)
        corr = self._fold(beta[..., None] * self.M2_MOD_A, MODS[:K], CS[:K], 2)
        t = e_a + (MODS[:K] - corr)
        r_a = jnp.where(t >= MODS[:K], t - MODS[:K], t)
        return jnp.concatenate([r_a, r_br], axis=-1).astype(_U16)

    def square(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def pow_static(self, a, e: int):
        if e == 0:
            return jnp.broadcast_to(self.one, a.shape)
        acc = a
        for bit in bin(e)[3:]:
            acc = self.square(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    @staticmethod
    def select(c, a, b):
        return jnp.where(c[..., None], a, b)

    def is_zero(self, a):
        """Value ≡ 0 (mod p)?  Boundary op: goes through canonical limbs
        (an RNS value k*p has nonzero residues but is zero in F_p)."""
        return jnp.all(self.to_limbs(a) == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(self.to_limbs(a) == self.to_limbs(b), axis=-1)

    def inv(self, a):
        """Inversion via the positional core (boundary op, used only by
        to_affine-style normalization)."""
        from .jnp_field import get_field

        F = get_field(self.fspec)
        return self.from_limbs(F.inv(self.to_limbs(a)))

    # ----------------------------------------------------------- conversions

    def from_limbs(self, limbs):
        """Positional Montgomery limbs (..., 16) u32 (value x*R mod p, from
        ff/jnp_field.py — must be canonical/reduced < 2p) -> RNS M-form
        residues of x*M (value < 18p)."""
        res = self._ext(limbs.astype(_U32), self.RHS_LIMBS, self.MODS, self.CS)
        return self.mul(res, self.TO_RNS)  # v = xR; * M^2 R^{-1} / M = x*M

    def to_limbs(self, a):
        """RNS M-form (value x*M mod p, bound < ~2^20 p) -> canonical
        positional Montgomery limbs (..., 16) holding x*R mod p, < p."""
        y = self.mul(a, self.FROM_RNS).astype(_U32)  # value x*R, < ~20p
        # σ'_j = y_j * (M2/m'_j)^{-1} mod m'_j over base B
        mods_b, cs_b = self.MODS[K : 2 * K], self.CS[K : 2 * K]
        sigma2 = self._modmul(y[..., K : 2 * K], self.SIGMA2_C, mods_b, cs_b)
        # W = Σ σ'_j * (M2/m'_j) as an 18-limb positional integer
        n = self.RHS_REC.shape[1] // 4  # 17 limb columns
        lhs = _split_u8(sigma2)
        out = jax.lax.dot_general(
            lhs.reshape(-1, lhs.shape[-1]),
            self.RHS_REC,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(_U32).reshape(lhs.shape[:-1] + (4 * n,))
        cols = (
            out[..., 0 * n : 1 * n]
            + ((out[..., 1 * n : 2 * n] + out[..., 2 * n : 3 * n]) << 8)
        )  # < 2^30
        hh = out[..., 3 * n : 4 * n]  # < 2^20.1, weight 2^16 -> next column
        # carry-normalize 18 limbs (17 columns + carry/hh spill)
        limbs = []
        carry = jnp.zeros(cols.shape[:-1], _U32)
        prev_hh = jnp.zeros(cols.shape[:-1], _U32)
        for l in range(n):
            v = cols[..., l] + prev_hh + carry
            limbs.append(v & _MASK16)
            carry = v >> 16
            prev_hh = hh[..., l]
        limbs.append((carry + prev_hh) & _MASK16)  # W < 17*M2 < 2^277 fits 18
        W = jnp.stack(limbs, axis=-1)  # (..., 18)
        # beta = (W - y) * M2^{-1} mod 2^16, exact since beta < 17
        beta = ((W[..., 0] + np.uint32(MR) - y[..., 2 * K]) & _MASK16) * self.M2INV_R & _MASK16
        # V = W - beta * M2 (18-limb subtraction, V = value(y) < 18p)
        bm2 = beta[..., None] * jnp.concatenate(
            [self.M2_LIMBS, jnp.zeros((1,), _U32)]
        )  # < 2^20.1 per limb
        V = self._sub_pos(W, bm2)
        # reduce < p via conditional subtracts of 16p, 8p, 4p, 2p, p
        for i in range(self.KP_LIMBS.shape[0]):
            V = self._cond_sub_pos(V, self.KP_LIMBS[i])
        return V[..., :NLIMBS]

    @staticmethod
    def _sub_pos(a, b):
        """18-limb a - b (a >= b; b limbs may be up to 2^21): borrow ripple."""
        outs = []
        borrow = jnp.zeros(a.shape[:-1], _U32)
        for l in range(a.shape[-1]):
            v = a[..., l] + np.uint32(1 << 22) - b[..., l] - borrow
            outs.append(v & _MASK16)
            borrow = np.uint32(1 << 6) - (v >> 16)
        return jnp.stack(outs, axis=-1)

    @staticmethod
    def _cond_sub_pos(a, m):
        outs = []
        borrow = jnp.zeros(a.shape[:-1], _U32)
        for l in range(a.shape[-1]):
            v = a[..., l] + np.uint32(1 << 16) - m[l] - borrow
            outs.append(v & _MASK16)
            borrow = np.uint32(1) - (v >> 16)
        d = jnp.stack(outs, axis=-1)
        return jnp.where((borrow == 0)[..., None], d, a)

    # host-side helpers (numpy, for tests and IO)

    def from_int(self, x):
        p = self.fspec.p
        if isinstance(x, (list, tuple)):
            vals = [(int(v) % p) * self.rspec.M % p for v in x]
            return jnp.asarray(
                np.array(
                    [[v % int(m) for m in self.rspec.mods] for v in vals],
                    dtype=np.uint16,
                )
            )
        v = (int(x) % p) * self.rspec.M % p
        return jnp.asarray(
            np.array([v % int(m) for m in self.rspec.mods], dtype=np.uint16)
        )

    def to_int(self, a):
        """Host: RNS array -> python ints (CRT over base A, then /M mod p)."""
        arr = np.asarray(a).astype(np.uint32).astype(object)
        p, M = self.rspec.p, self.rspec.M
        minv = pow(M, -1, p)
        mods = [int(m) for m in self.rspec.mods[:K]]

        def crt(res):
            x = 0
            for i, m in enumerate(mods):
                Mi = M // m
                x += int(res[i]) * pow(Mi, -1, m) % m * Mi
            return x % M * minv % p

        if arr.ndim == 1:
            return crt(arr)
        flat = arr.reshape(-1, NRES)
        return np.array([crt(v) for v in flat], dtype=object).reshape(arr.shape[:-1])


@functools.lru_cache(maxsize=None)
def get_rns_field(spec: FieldSpec) -> RnsField:
    return RnsField(spec)

"""Vectorized prime-field limb arithmetic in JAX (uint32 lanes only).

Every element is a uint32 array of shape (..., 16): 16 little-endian 16-bit
limbs.  All ops broadcast over leading batch dims, are jit/vmap/shard_map
friendly, and never need 64-bit integers: 16x16-bit partial products fit in
uint32 exactly, and column accumulators stay < 2^22.

Representation invariants (lazy/redundant reduction — a deliberate TPU
compile-time/runtime optimization):
  * limbs are always < 2^16,
  * the represented VALUE is in [0, 2p] (NOT fully reduced!).
Montgomery multiplication maps [0,2p]x[0,2p] -> [0,2p] without a final
conditional subtraction (since 4p < R = 2^256); add/sub reduce mod 2p.
Anything that compares or exports values canonicalizes first (`canon`).

Montgomery product columns are computed with a one-hot dot_general (a single
MXU/VPU-friendly contraction) instead of long update-slice chains: this keeps
XLA graphs small, which matters because EC formulas compose ~20 muls.

Reference parity (behavioral): plays the role of `util::arithmetic` in
/root/reference/snark-verifier/src/util/arithmetic.rs (`batch_invert_and_mul`
:52-75, `powers`/`inner_product`/`horner` :293-304); the limb/lazy-reduction
design here is TPU-native and independent.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .spec import MASK, NLIMBS, W, FieldSpec, int_to_limbs, limbs_to_int

_U32 = jnp.uint32
NCOLS = 2 * NLIMBS + 1  # product column buffer width


def _u(x: int):
    return _U32(x)


# Optional full unrolling of the 16-step limb scans for ops at or below this
# many field elements (FF_UNROLL_MAX=N).  Measured on TPU v5e (round 4): at
# verify-path batch shapes (~3k elements) unrolling is runtime-neutral —
# per-op cost is ~150us either way because BOTH forms are bound by ~2-3us of
# fixed per-kernel/per-loop-iteration overhead, not vector work — while the
# succinct-verify compile blows up 3x.  Default OFF; the small-shape fix is
# fused Pallas kernels (hash/pallas_poseidon.py), not unrolling.
_UNROLL_MAX = int(os.environ.get("FF_UNROLL_MAX", "0"))


def _roll(bshape) -> int:
    """lax.scan unroll factor for an op over batch shape `bshape`."""
    n = 1
    for d in bshape:
        n *= d
    return NLIMBS if n <= _UNROLL_MAX else 1


class LimbField:
    """Field ops over (..., 16)-uint32 Montgomery-form limb arrays."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.P = jnp.asarray(spec.p_limbs)  # (16,)
        self.P2 = jnp.asarray(int_to_limbs(2 * spec.p))
        self.R2 = jnp.asarray(spec.r2_limbs)
        self.NINV = _u(spec.ninv)
        self.zero = jnp.zeros((NLIMBS,), _U32)
        self.one = jnp.asarray(spec.r_limbs)  # 1 in Montgomery form
        e = spec.p - 2
        self._inv_bits = jnp.asarray(
            [(e >> i) & 1 for i in range(spec.num_bits)], dtype=_U32
        )

    # ---------------------------------------------------------------- helpers

    @staticmethod
    def _carry16(t):
        """Ripple carries over last-axis 16 limbs (inputs < 2^31).
        Returns (limbs, carry_out).  lax.scan keeps the jaxpr tiny — compile
        cost matters because EC formulas compose tens of muls."""

        def body(c, tk):
            v = tk + c
            return v >> W, v & _u(MASK)

        c0 = jnp.zeros(t.shape[:-1], _U32)
        cout, outs = jax.lax.scan(
            body, c0, jnp.moveaxis(t, -1, 0), unroll=_roll(t.shape[:-1])
        )
        return jnp.moveaxis(outs, 0, -1), cout

    @staticmethod
    def _sub_limbs(a, b):
        """a - b limbwise with borrow chain. Returns (diff, borrow)."""
        a, b = jnp.broadcast_arrays(a, b)

        def body(borrow, ab):
            ak, bk = ab
            v = ak + _u(1 << W) - bk - borrow
            return _u(1) - (v >> W), v & _u(MASK)

        b0 = jnp.zeros(a.shape[:-1], _U32)
        borrow, outs = jax.lax.scan(
            body,
            b0,
            (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)),
            unroll=_roll(a.shape[:-1]),
        )
        return jnp.moveaxis(outs, 0, -1), borrow

    def _cond_sub(self, a, m):
        """Subtract modulus-limbs m if a >= m."""
        d, borrow = self._sub_limbs(a, m)
        return jnp.where((borrow == 0)[..., None], d, a)

    def canon(self, a):
        """Map the redundant [0, 2p] representation to canonical [0, p)."""
        return self._cond_sub(self._cond_sub(a, self.P2), self.P)

    # ------------------------------------------------------------ arithmetic

    def add(self, a, b):
        t = a + b  # limbs < 2^17
        s, _ = self._carry16(t)  # a+b <= 4p < 2^256: no carry out
        return self._cond_sub(s, self.P2)

    def sub(self, a, b):
        """a - b + 2p, reduced mod 2p: stays in [0, 2p]."""
        d, borrow = self._sub_limbs(a, b)
        # borrow==1: value is a-b+2^256; adding 2p and dropping the carry-out
        # of 2^256 yields a-b+2p.  borrow==0: a-b in [0,2p] already.
        dp = d + self.P2
        s, _ = self._carry16(dp)
        return jnp.where((borrow == 1)[..., None], s, d)

    def neg(self, a):
        d, _ = self._sub_limbs(self.P2 + jnp.zeros_like(a), a)
        return d  # 2p - a, in [0, 2p]

    def mul(self, a, b):
        """Montgomery product a*b*R^{-1}; [0,2p] in, [0,2p] out.

        CIOS (coarsely-integrated operand scanning) as ONE 16-step lax.scan:
        each step merges one operand limb's partial products with one limb of
        Montgomery reduction and shifts the rolling column window.  Column
        accumulators stay < 2^23, so everything is exact in uint32.  The
        scanned body keeps the jaxpr tiny (EC formulas compose tens of muls)
        and benchmarked ~6x faster than a dot_general column formulation."""
        bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, bshape + (NLIMBS,))
        b = jnp.broadcast_to(b, bshape + (NLIMBS,))
        P = self.P
        NINV = self.NINV

        def body(t, ai):
            row = ai[..., None] * b
            t = t.at[..., :NLIMBS].add(row & _u(MASK))
            t = t.at[..., 1 : NLIMBS + 1].add(row >> W)
            m = (t[..., 0] * NINV) & _u(MASK)
            row2 = m[..., None] * P
            t = t.at[..., :NLIMBS].add(row2 & _u(MASK))
            t = t.at[..., 1 : NLIMBS + 1].add(row2 >> W)
            t = t.at[..., 1].add(t[..., 0] >> W)
            t = jnp.concatenate(
                [t[..., 1:], jnp.zeros(t.shape[:-1] + (1,), _U32)], axis=-1
            )
            return t, None

        t0 = jnp.zeros(bshape + (NLIMBS + 2,), _U32)
        t, _ = jax.lax.scan(
            body, t0, jnp.moveaxis(a, -1, 0), unroll=_roll(bshape)
        )
        s, _ = self._carry16(t[..., :NLIMBS])  # value <= 2p, fits 16 limbs
        return s

    def square(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for small static k via double/add chains."""
        if k == 0:
            return jnp.broadcast_to(self.zero, a.shape)
        acc = a
        for bit in bin(k)[3:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def double(self, a):
        return self.add(a, a)

    # ---------------------------------------------------------------- powers

    def pow_static(self, a, e: int):
        """a^e for a static Python-int exponent (unrolled square&multiply)."""
        if e == 0:
            return jnp.broadcast_to(self.one, a.shape)
        acc = a
        for bit in bin(e)[3:]:
            acc = self.square(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    def inv(self, a):
        """a^{p-2} via lax.scan over static exponent bits (0 maps to 0)."""
        bits = self._inv_bits

        def body(acc, bit):
            acc = self.square(acc)
            acc = jnp.where(bit[..., None].astype(bool), self.mul(acc, a), acc)
            return acc, None

        init = jnp.broadcast_to(self.one, a.shape)
        acc, _ = jax.lax.scan(body, init, bits[::-1])
        return acc

    def pow_dyn(self, a, e_bits):
        """a^e for a runtime exponent as a little-endian uint32 bit array."""

        def body(acc, bit):
            acc = self.square(acc)
            acc = jnp.where(bit[..., None].astype(bool), self.mul(acc, a), acc)
            return acc, None

        init = jnp.broadcast_to(self.one, a.shape)
        acc, _ = jax.lax.scan(body, init, e_bits[::-1])
        return acc

    def batch_inv(self, a):
        """Montgomery-trick batched inversion over the leading axis; zeros map
        to zero (reference `batch_invert_and_mul` util/arithmetic.rs:52-75
        requires nonzero — we tolerate zeros for vmap safety)."""
        is_z = self.is_zero(a)[..., None]
        a_safe = jnp.where(is_z, self.one, a)
        prefix = jax.lax.associative_scan(self.mul, a_safe, axis=0)
        total_inv = self.inv(prefix[-1])

        def body(carry, xs):
            ai, pi_prev = xs
            out = self.mul(carry, pi_prev)
            carry = self.mul(carry, ai)
            return carry, out

        pi_prev = jnp.concatenate(
            [jnp.broadcast_to(self.one, a_safe[:1].shape), prefix[:-1]], axis=0
        )
        _, outs = jax.lax.scan(body, total_inv, (a_safe[::-1], pi_prev[::-1]))
        outs = outs[::-1]
        return jnp.where(is_z, jnp.zeros_like(a), outs)

    # ------------------------------------------------------------ predicates

    def is_zero(self, a):
        return jnp.all(self.canon(a) == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(self.canon(a) == self.canon(b), axis=-1)

    @staticmethod
    def select(c, a, b):
        """c ? a : b with c of shape (...,)."""
        return jnp.where(c[..., None], a, b)

    # ----------------------------------------------------------- conversions

    def to_mont(self, a):
        return self.mul(a, self.R2)

    def from_mont(self, a):
        """Montgomery reduction of a (multiply by plain 1), canonicalized."""
        one_plain = jnp.zeros((NLIMBS,), _U32).at[0].set(1)
        return self.canon(self.mul(a, one_plain))

    def from_int(self, x):
        """Host-side: python int(s) -> Montgomery limb array (pure numpy —
        no device dispatch, important under slow device tunnels)."""
        p, R = self.spec.p, 1 << (W * NLIMBS)
        if isinstance(x, (list, tuple)):
            arr = np.stack([int_to_limbs((v % p) * R % p) for v in x])
        else:
            arr = int_to_limbs((x % p) * R % p)
        return jnp.asarray(arr)

    def to_int(self, a):
        """Host-side: Montgomery limb array -> python int(s) (pure numpy)."""
        p, R = self.spec.p, 1 << (W * NLIMBS)
        rinv = pow(R, -1, p)
        mont = np.asarray(a)
        if mont.ndim == 1:
            return limbs_to_int(mont) * rinv % p
        flat = mont.reshape(-1, NLIMBS)
        vals = [limbs_to_int(v) * rinv % p for v in flat]
        return np.array(vals, dtype=object).reshape(mont.shape[:-1])

    def to_repr_u16(self, a):
        """Device-side canonical value as 16 uint32-held 16-bit limbs."""
        return self.from_mont(a)


def u16_limbs_to_bits(a):
    """(..., 16) canonical 16-bit limbs -> (..., 256) bits, little-endian."""
    shifts = jnp.arange(W, dtype=_U32)
    bits = (a[..., :, None] >> shifts) & _u(1)  # (..., 16, 16)
    return bits.reshape(a.shape[:-1] + (W * NLIMBS,))


def u16_limbs_to_digits4(a):
    """(..., 16) canonical 16-bit limbs -> (..., 64) 4-bit digits, LSB-first
    (digit j of limb i sits at index 4*i + j)."""
    shifts = jnp.arange(0, W, 4, dtype=_U32)
    digs = (a[..., :, None] >> shifts) & _u(0xF)  # (..., 16, 4)
    return digs.reshape(a.shape[:-1] + (4 * NLIMBS,))


@functools.lru_cache(maxsize=None)
def _get(spec: FieldSpec) -> LimbField:
    return LimbField(spec)


def get_field(spec: FieldSpec) -> LimbField:
    return _get(spec)

"""Vectorized prime-field limb arithmetic in JAX (uint32 lanes only).

Every element is a uint32 array of shape (..., 16): 16 little-endian 16-bit
limbs.  All ops broadcast over leading batch dims, are jit/vmap/shard_map
friendly, and never need 64-bit integers: 16x16-bit partial products fit in
uint32 exactly, and column accumulators stay < 2^22.

Internal representation is Montgomery form (R = 2^256).  Conversions happen at
the package boundary (from_int / to_int).

Reference parity notes (behavioral, not translated): mirrors the role of
`util::arithmetic` in the reference (/root/reference/snark-verifier/src/util/
arithmetic.rs — `batch_invert_and_mul` :52-75, `powers`/`inner_product`/
`horner` :293-304).  The design (limb planes + Montgomery on 16-bit limbs) is
TPU-native and shares no structure with the Rust code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import MASK, NLIMBS, W, FieldSpec, int_to_limbs, limbs_to_int

_U32 = jnp.uint32


def _u(x: int):
    return _U32(x)


class LimbField:
    """Field ops over (..., 16)-uint32 Montgomery-form limb arrays."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.P = jnp.asarray(spec.p_limbs)  # (16,)
        self.R2 = jnp.asarray(spec.r2_limbs)
        self.NINV = _u(spec.ninv)
        self.zero = jnp.zeros((NLIMBS,), _U32)
        self.one = jnp.asarray(spec.r_limbs)  # 1 in Montgomery form
        # Static exponent bit-array for inversion: p - 2, little-endian bits.
        e = spec.p - 2
        self._inv_bits = jnp.asarray(
            [(e >> i) & 1 for i in range(spec.num_bits)], dtype=_U32
        )

    # ---------------------------------------------------------------- helpers

    @staticmethod
    def _carry16(t):
        """Propagate carries over the last-axis 16 limbs; values must be <2^31.

        Returns (limbs, carry_out)."""
        outs = []
        c = jnp.zeros(t.shape[:-1], _U32)
        for k in range(NLIMBS):
            v = t[..., k] + c
            outs.append(v & _u(MASK))
            c = v >> W
        return jnp.stack(outs, axis=-1), c

    def _sub_limbs(self, a, b):
        """a - b limbwise with borrow chain. Returns (diff, borrow)."""
        outs = []
        borrow = jnp.zeros(a.shape[:-1], _U32)
        for k in range(NLIMBS):
            v = a[..., k] + _u(1 << W) - b[..., k] - borrow
            outs.append(v & _u(MASK))
            borrow = _u(1) - (v >> W)
        return jnp.stack(outs, axis=-1), borrow

    def _cond_sub_p(self, a):
        """Reduce a < 2p into [0, p)."""
        d, borrow = self._sub_limbs(a, self.P)
        return jnp.where((borrow == 0)[..., None], d, a)

    # ------------------------------------------------------------ arithmetic

    def add(self, a, b):
        t = a + b  # limbs < 2^17
        s, _ = self._carry16(t)  # a+b < 2p < 2^256, carry_out == 0
        return self._cond_sub_p(s)

    def sub(self, a, b):
        d, borrow = self._sub_limbs(a, b)
        dp = d + self.P
        s, _ = self._carry16(dp)
        return jnp.where((borrow == 1)[..., None], s, d)

    def neg(self, a):
        d, _ = self._sub_limbs(self.P + jnp.zeros_like(a), a)
        # p - a; if a == 0 this gives p, fold back to 0.
        return jnp.where(self.is_zero(a)[..., None], jnp.zeros_like(a), d)

    def mul(self, a, b):
        """Montgomery product: a*b*R^{-1} mod p."""
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        t = jnp.zeros(shape + (2 * NLIMBS,), _U32)
        # Schoolbook product with lo/hi split so columns stay < 2^21.
        for i in range(NLIMBS):
            row = a[..., i : i + 1] * b  # (...,16), exact in uint32
            t = t.at[..., i : i + NLIMBS].add(row & _u(MASK))
            t = t.at[..., i + 1 : i + 1 + NLIMBS].add(row >> W)
        # Interleaved Montgomery reduction, one limb per step.
        for i in range(NLIMBS):
            m = (t[..., i] * self.NINV) & _u(MASK)
            row = m[..., None] * self.P
            t = t.at[..., i : i + NLIMBS].add(row & _u(MASK))
            t = t.at[..., i + 1 : i + 1 + NLIMBS].add(row >> W)
            t = t.at[..., i + 1].add(t[..., i] >> W)  # column i is ≡ 0 mod 2^16
        res = t[..., NLIMBS:]
        s, _ = self._carry16(res)  # result < 2p, fits 16 limbs
        return self._cond_sub_p(s)

    def square(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for small static k via repeated addition (k <= ~30)."""
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
        bits = self._inv_bits  # little-endian; scan from MSB down

        def body(acc, bit):
            acc = self.square(acc)
            acc = jnp.where(bit[..., None].astype(bool), self.mul(acc, a), acc)
            return acc, None

        init = jnp.broadcast_to(self.one, a.shape)
        acc, _ = jax.lax.scan(body, init, bits[::-1])
        return acc

    def pow_dyn(self, a, e_bits):
        """a^e for a runtime exponent given as a (nbits,)-uint32 bit array
        (little-endian). Scanned MSB-first."""

        def body(acc, bit):
            acc = self.square(acc)
            acc = jnp.where(bit[..., None].astype(bool), self.mul(acc, a), acc)
            return acc, None

        init = jnp.broadcast_to(self.one, a.shape)
        acc, _ = jax.lax.scan(body, init, e_bits[::-1])
        return acc

    def batch_inv(self, a):
        """Montgomery-trick batched inversion over the leading axis.

        Zero entries map to zero (matching the reference's convention in
        `batch_invert_and_mul`, util/arithmetic.rs:52-75, which requires
        nonzero inputs — we extend it to tolerate zeros for vmap safety).
        """
        is_z = self.is_zero(a)[..., None]
        a_safe = jnp.where(is_z, self.one, a)

        def mul_pair(x, y):
            return self.mul(x, y)

        prefix = jax.lax.associative_scan(mul_pair, a_safe, axis=0)
        total_inv = self.inv(prefix[-1])

        # suffix pass: inv_i = prefix_{i-1} * suffix_inv_i
        def body(carry, xs):
            ai, pi_prev = xs
            out = self.mul(carry, pi_prev)
            carry = self.mul(carry, ai)
            return carry, out

        n = a.shape[0]
        pi_prev = jnp.concatenate(
            [jnp.broadcast_to(self.one, a_safe[:1].shape), prefix[:-1]], axis=0
        )
        _, outs = jax.lax.scan(body, total_inv, (a_safe[::-1], pi_prev[::-1]))
        outs = outs[::-1]
        return jnp.where(is_z, jnp.zeros_like(a), outs)

    # ------------------------------------------------------------ predicates

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def select(c, a, b):
        """c ? a : b with c of shape (...,)."""
        return jnp.where(c[..., None], a, b)

    # ----------------------------------------------------------- conversions

    def to_mont(self, a):
        return self.mul(a, self.R2)

    def from_mont(self, a):
        """Multiply by 1 (non-Montgomery) == Montgomery reduction of a."""
        one_plain = jnp.zeros((NLIMBS,), _U32).at[0].set(1)
        return self.mul(a, one_plain)

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

    # canonical little-endian bytes of the standard (non-Montgomery) value
    def to_repr_u16(self, a):
        """Device-side canonical value as 16 uint32-held 16-bit limbs."""
        return self.from_mont(a)


@functools.lru_cache(maxsize=None)
def _get(spec: FieldSpec) -> LimbField:
    return LimbField(spec)


def get_field(spec: FieldSpec) -> LimbField:
    return _get(spec)

"""BN254 extension-field towers as vectorized limb-plane ops.

Layouts (trailing dims; leading dims broadcast):
  Fq2  : (..., 2, 16)        c0 + c1·u,  u² = -1
  Fq6  : (..., 3, 2, 16)     c0 + c1·v + c2·v²,  v³ = ξ = 9+u
  Fq12 : (..., 2, 3, 2, 16)  c0 + c1·w,  w² = v

All multiplication trees stack their independent base-field products into a
single batched Fq mul (Fq12 mul = 54 Fq muls issued as ONE CIOS kernel call),
which keeps both XLA compile time and HBM traffic flat.

Each class exposes the same interface as ff.LimbField (add/sub/neg/mul/
square/mul_small/double/inv/is_zero/eq/select + `one`, `edims`) so
ec.CurveOps works over any of them (G2 = CurveOps over Fq2).

Gold model: pairing/py_pairing.py (pure ints); parity enforced in tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ff import FQ_FIELD

F = FQ_FIELD


def _stk(*xs):
    return jnp.stack(xs, 0)


class Fq2Field:
    edims = 2

    def __init__(self):
        zero = jnp.zeros_like(F.one)
        self.one = jnp.stack([F.one, zero], 0)
        self.zero = jnp.stack([zero, zero], 0)

    @staticmethod
    def c(a, i):
        return a[..., i, :]

    @staticmethod
    def make(c0, c1):
        c0, c1 = jnp.broadcast_arrays(c0, c1)
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        return F.add(a, b)  # componentwise over the extra axis

    def sub(self, a, b):
        return F.sub(a, b)

    def neg(self, a):
        return F.neg(a)

    def double(self, a):
        return F.double(a)

    def mul_small(self, a, k: int):
        return F.mul_small(a, k)

    def mul(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        m = F.mul(_stk(a0, a1, F.add(a0, a1)), _stk(b0, b1, F.add(b0, b1)))
        t0, t1, t2 = m[0], m[1], m[2]
        return self.make(F.sub(t0, t1), F.sub(t2, F.add(t0, t1)))

    def square(self, a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        m = F.mul(_stk(F.add(a0, a1), a0), _stk(F.sub(a0, a1), a1))
        return self.make(m[0], F.double(m[1]))

    def smul(self, a, s):
        """Scale both components by an Fq element s (..., 16)."""
        return F.mul(a, s[..., None, :])

    def conj(self, a):
        return self.make(a[..., 0, :], F.neg(a[..., 1, :]))

    def mul_xi(self, a):
        """a * (9 + u)."""
        a0, a1 = a[..., 0, :], a[..., 1, :]
        return self.make(
            F.sub(F.mul_small(a0, 9), a1), F.add(a0, F.mul_small(a1, 9))
        )

    def inv(self, a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        m = F.mul(_stk(a0, a1), _stk(a0, a1))
        d = F.inv(F.add(m[0], m[1]))
        m2 = F.mul(_stk(a0, F.neg(a1)), d[None])
        return self.make(m2[0], m2[1])

    def is_zero(self, a):
        return F.is_zero(a[..., 0, :]) & F.is_zero(a[..., 1, :])

    def eq(self, a, b):
        return F.eq(a[..., 0, :], b[..., 0, :]) & F.eq(a[..., 1, :], b[..., 1, :])

    @staticmethod
    def select(c, a, b):
        return jnp.where(c[..., None, None], a, b)

    def canon(self, a):
        return F.canon(a)


class Fq6Field:
    edims = 3

    def __init__(self, f2: Fq2Field):
        self.f2 = f2
        self.one = jnp.stack([f2.one, f2.zero, f2.zero], 0)
        self.zero = jnp.stack([f2.zero, f2.zero, f2.zero], 0)

    @staticmethod
    def make(c0, c1, c2):
        c0, c1, c2 = jnp.broadcast_arrays(c0, c1, c2)
        return jnp.stack([c0, c1, c2], axis=-3)

    def _c(self, a):
        return a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]

    def add(self, a, b):
        return F.add(a, b)

    def sub(self, a, b):
        return F.sub(a, b)

    def neg(self, a):
        return F.neg(a)

    def double(self, a):
        return F.double(a)

    def mul_small(self, a, k: int):
        return F.mul_small(a, k)

    def mul(self, a, b):
        f2 = self.f2
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1, a2 = self._c(a)
        b0, b1, b2 = self._c(b)
        m = f2.mul(
            _stk(a0, a1, a2, f2.add(a1, a2), f2.add(a0, a1), f2.add(a0, a2)),
            _stk(b0, b1, b2, f2.add(b1, b2), f2.add(b0, b1), f2.add(b0, b2)),
        )
        t0, t1, t2, s12, s01, s02 = m[0], m[1], m[2], m[3], m[4], m[5]
        c0 = f2.add(t0, f2.mul_xi(f2.sub(s12, f2.add(t1, t2))))
        c1 = f2.add(f2.sub(s01, f2.add(t0, t1)), f2.mul_xi(t2))
        c2 = f2.add(f2.sub(s02, f2.add(t0, t2)), t1)
        return self.make(c0, c1, c2)

    def square(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a):
        a0, a1, a2 = self._c(a)
        return self.make(self.f2.mul_xi(a2), a0, a1)

    def inv(self, a):
        f2 = self.f2
        a0, a1, a2 = self._c(a)
        sq = f2.mul(_stk(a0, a1, a2), _stk(a0, a1, a2))
        m1 = f2.mul(_stk(a1, a0, a0), _stk(a2, a1, a2))
        c0 = f2.sub(sq[0], f2.mul_xi(m1[0]))
        c1 = f2.sub(f2.mul_xi(sq[2]), m1[1])
        c2 = f2.sub(sq[1], m1[2])
        m2 = f2.mul(_stk(a2, a1, a0), _stk(c1, c2, c0))
        t = f2.add(f2.mul_xi(f2.add(m2[0], m2[1])), m2[2])
        ti = f2.inv(t)
        m3 = f2.mul(_stk(c0, c1, c2), ti[None])
        return self.make(m3[0], m3[1], m3[2])

    def is_zero(self, a):
        a0, a1, a2 = self._c(a)
        f2 = self.f2
        return f2.is_zero(a0) & f2.is_zero(a1) & f2.is_zero(a2)

    def eq(self, a, b):
        eqs = self.f2.eq
        return (
            eqs(a[..., 0, :, :], b[..., 0, :, :])
            & eqs(a[..., 1, :, :], b[..., 1, :, :])
            & eqs(a[..., 2, :, :], b[..., 2, :, :])
        )

    @staticmethod
    def select(c, a, b):
        return jnp.where(c[..., None, None, None], a, b)


class Fq12Field:
    edims = 4

    def __init__(self, f6: Fq6Field):
        self.f6 = f6
        self.f2 = f6.f2
        self.one = jnp.stack([f6.one, f6.zero], 0)
        self.zero = jnp.stack([f6.zero, f6.zero], 0)

    @staticmethod
    def make(c0, c1):
        c0, c1 = jnp.broadcast_arrays(c0, c1)
        return jnp.stack([c0, c1], axis=-4)

    def _c(self, a):
        return a[..., 0, :, :, :], a[..., 1, :, :, :]

    def add(self, a, b):
        return F.add(a, b)

    def sub(self, a, b):
        return F.sub(a, b)

    def neg(self, a):
        return F.neg(a)

    def mul(self, a, b):
        f6 = self.f6
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1 = self._c(a)
        b0, b1 = self._c(b)
        m = f6.mul(_stk(a0, a1, f6.add(a0, a1)), _stk(b0, b1, f6.add(b0, b1)))
        t0, t1, t2 = m[0], m[1], m[2]
        c0 = f6.add(t0, f6.mul_by_v(t1))
        c1 = f6.sub(t2, f6.add(t0, t1))
        return self.make(c0, c1)

    def square(self, a):
        return self.mul(a, a)

    def conj(self, a):
        a0, a1 = self._c(a)
        return self.make(a0, f6.neg(a1) if (f6 := self.f6) else None)

    def inv(self, a):
        f6 = self.f6
        a0, a1 = self._c(a)
        sq = f6.mul(_stk(a0, a1), _stk(a0, a1))
        t = f6.inv(f6.sub(sq[0], f6.mul_by_v(sq[1])))
        m = f6.mul(_stk(a0, f6.neg(a1)), t[None])
        return self.make(m[0], m[1])

    def mul_by_034(self, f, c0, c3, c4):
        """f * (c0 + c3·w + c4·v·w) with c0,c3,c4 in Fq2 — sparse line mul.

        Uses the generic Fq12 mul on the sparse operand (correctness-first;
        a dedicated sparse kernel is a later optimization)."""
        f2, f6 = self.f2, self.f6
        a = f6.make(c0, jnp.broadcast_to(f2.zero, c0.shape), jnp.broadcast_to(f2.zero, c0.shape))
        b = f6.make(c3, c4, jnp.broadcast_to(f2.zero, c3.shape))
        return self.mul(f, self.make(a, b))

    def is_one(self, a):
        a0, a1 = self._c(a)
        return self.f6.eq(a0, self.f6.one) & self.f6.is_zero(a1)

    def eq(self, a, b):
        return self.f6.eq(a[..., 0, :, :, :], b[..., 0, :, :, :]) & self.f6.eq(
            a[..., 1, :, :, :], b[..., 1, :, :, :]
        )

    @staticmethod
    def select(c, a, b):
        return jnp.where(c[..., None, None, None, None], a, b)

    def pow_bits(self, a, bits):
        """a^e via lax.scan over a static little-endian uint32 bit array."""
        import jax

        def body(acc, bit):
            acc = self.square(acc)
            take = bit.astype(bool)
            acc = self.select(jnp.broadcast_to(take, acc.shape[:-4]), self.mul(acc, a), acc)
            return acc, None

        init = jnp.broadcast_to(self.one, a.shape)
        acc, _ = jax.lax.scan(body, init, bits[::-1])
        return acc


FQ2 = Fq2Field()
FQ6 = Fq6Field(FQ2)
FQ12 = Fq12Field(FQ6)

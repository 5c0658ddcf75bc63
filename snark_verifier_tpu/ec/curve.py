"""Generic short-Weierstrass (a=0) Jacobian curve ops over any limb field.

Points are stacked coordinate arrays: shape (..., 3) + elem_shape where
elem_shape is the field element's trailing shape ((16,) for Fq, (2,16) for
Fq2).  Infinity is encoded as Z == 0 (all-zero limbs).  All ops are complete
(they handle doubling and infinity via selects), broadcast over leading batch
dims, and are jit/vmap/scan-friendly.

Compile-time design note: XLA graph size scales with the number of *distinct*
field-mul instances, not the batch size, so independent multiplications inside
a formula are stacked along a fresh leading axis and issued as ONE batched
mul.  This cuts EC-add compile time by ~4x.

Formulas: dbl-2009-l and add-2007-bl (EFD), chosen for low mul count on a=0
curves.  Reference parity: provides the group ops underlying `util::msm` and
the native loader (/root/reference/snark-verifier/src/util/msm.rs,
loader/native.rs, which delegate to halo2curves); independent TPU design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class CurveOps:
    """Jacobian-coordinate group ops, generic over the coordinate field."""

    def __init__(self, field, b: int, name: str = "curve"):
        self.F = field
        self.name = name
        self.b_int = b
        self.edims = getattr(field, "edims", 1)

    def _elem_shape(self):
        return tuple(jnp.shape(self.F.one))

    # ------------------------------------------------------------- structure

    def stack(self, x, y, z):
        return jnp.stack([x, y, z], axis=-1 - self.edims)

    def coords(self, pt):
        ax = -1 - self.edims
        x, y, z = jnp.split(pt, 3, axis=ax)
        return x.squeeze(ax), y.squeeze(ax), z.squeeze(ax)

    def batch_shape(self, pt):
        """Leading batch dims of a point array (strips (3,) + elem_shape)."""
        return pt.shape[: -(1 + self.edims)]

    def infinity(self, batch_shape=()):
        shape = tuple(batch_shape) + (3,) + self._elem_shape()
        return jnp.zeros(shape, jnp.uint32)

    def is_infinity(self, pt):
        _, _, z = self.coords(pt)
        return self.F.is_zero(z)

    def _sel(self, c, a, b):
        """c ? a : b with c of batch shape, a/b points."""
        cexp = c[(...,) + (None,) * (1 + self.edims)]
        return jnp.where(cexp, a, b)

    # ------------------------------------------------------------ group law

    def double(self, pt):
        F = self.F
        x, y, z = self.coords(pt)
        sa, sb = self._unstack2(F.square(jnp.stack([x, y], 0)))  # x^2, y^2
        prod = F.mul(
            jnp.stack([sb, F.add(x, sb), y], 0), jnp.stack([sb, F.add(x, sb), z], 0)
        )
        c, xb2, yz = prod[0], prod[1], prod[2]  # b^2, (x+b)^2, y*z
        d = F.double(F.sub(F.sub(xb2, sa), c))
        e = F.mul_small(sa, 3)
        f = F.square(e)
        x3 = F.sub(f, F.double(d))
        y3 = F.sub(F.mul(e, F.sub(d, x3)), F.mul_small(c, 8))
        z3 = F.double(yz)
        return self.stack(x3, y3, z3)

    @staticmethod
    def _unstack2(a):
        return a[0], a[1]

    def add(self, p, q):
        """Complete Jacobian addition (handles P==Q, P==-Q, infinities)."""
        F = self.F
        p, q = jnp.broadcast_arrays(p, q)
        x1, y1, z1 = self.coords(p)
        x2, y2, z2 = self.coords(q)
        zz = F.square(jnp.stack([z1, z2], 0))
        z1z1, z2z2 = zz[0], zz[1]
        m1 = F.mul(
            jnp.stack([x1, x2, y1, y2], 0), jnp.stack([z2z2, z1z1, z2, z1], 0)
        )
        u1, u2, t1, t2 = m1[0], m1[1], m1[2], m1[3]
        m2 = F.mul(jnp.stack([t1, t2], 0), jnp.stack([z2z2, z1z1], 0))
        s1, s2 = m2[0], m2[1]
        h = F.sub(u2, u1)
        rr = F.double(F.sub(s2, s1))
        h2 = F.double(h)
        zs = F.add(z1, z2)
        m3 = F.square(jnp.stack([h2, zs, rr], 0))
        i, zs2, rr2 = m3[0], m3[1], m3[2]
        m4 = F.mul(
            jnp.stack([h, u1, F.sub(F.sub(zs2, z1z1), z2z2)], 0),
            jnp.stack([i, i, h], 0),
        )
        j, v, z3 = m4[0], m4[1], m4[2]
        x3 = F.sub(F.sub(rr2, j), F.double(v))
        m5 = F.mul(jnp.stack([rr, s1], 0), jnp.stack([F.sub(v, x3), j], 0))
        y3 = F.sub(m5[0], F.double(m5[1]))
        out = self.stack(x3, y3, z3)

        h_zero = F.is_zero(h)
        r_zero = F.is_zero(rr)
        inf1 = F.is_zero(z1)
        inf2 = F.is_zero(z2)
        # P == Q (same affine point): fall back to doubling.
        out = self._sel(h_zero & r_zero & ~inf1 & ~inf2, self.double(p), out)
        # P == -Q: infinity.
        out = self._sel(
            h_zero & ~r_zero & ~inf1 & ~inf2, self.infinity(self.batch_shape(out)), out
        )
        out = self._sel(inf1, q, out)
        out = self._sel(inf2, p, out)
        return out

    def neg(self, pt):
        x, y, z = self.coords(pt)
        return self.stack(x, self.F.neg(y), z)

    def scalar_mul_bits(self, pt, bits):
        """pt * scalar, scalar given as a (nbits,)-uint32 little-endian bit
        array (runtime value). Scans MSB-first double-and-add."""

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, pt)
            cond = jnp.broadcast_to(bit.astype(bool), self.batch_shape(acc))
            acc = self._sel(cond, added, acc)
            return acc, None

        init = self.infinity(self.batch_shape(pt))
        acc, _ = jax.lax.scan(body, init, bits[::-1])
        return acc

    # -------------------------------------------------------------- affine

    def to_affine(self, pt):
        """Device-side normalization: returns (x, y, is_inf)."""
        F = self.F
        x, y, z = self.coords(pt)
        zinv = F.inv(z)
        zinv2 = F.square(zinv)
        ax = F.mul(x, zinv2)
        ay = F.mul(y, F.mul(zinv, zinv2))
        return ax, ay, F.is_zero(z)

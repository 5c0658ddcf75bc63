"""Generic short-Weierstrass (a=0) curve ops over any limb field.

Points are homogeneous projective coordinates stacked as (..., 3) + elem_shape
(elem_shape = (16,) for Fq, (2,16) for Fq2).  Infinity is (0 : 1 : 0).

Group law: Renes–Costello 2015 *complete* addition (Algorithm 7 for a=0) —
branchless: the same 12-mul formula is correct for P==Q, P==-Q and identity
inputs, so no predicate/select logic is needed.  That matters twice on TPU:
selects cost lanes, and (more importantly) the predicate-free graph keeps XLA
compile time flat.  The 12 muls have only 2 dependency layers, so each add
issues exactly 2 batched field-mul instances.

Completeness requires odd-order groups — true for BN254 G1/G2 subgroups.

Reference parity: provides the group ops underlying `util::msm` and the
native loader (/root/reference/snark-verifier/src/util/msm.rs,
loader/native.rs, which delegate to halo2curves' Jacobian formulas); the
complete-projective choice here is an independent TPU-native design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class CurveOps:
    """Complete projective group ops, generic over the coordinate field."""

    def __init__(self, field, b: int, name: str = "curve", b3_elem=None):
        self.F = field
        self.name = name
        self.b_int = b
        self.edims = getattr(field, "edims", 1)
        # 3*b as a field element for extension-field curves, else small-int 3b
        self.b3_elem = b3_elem
        self.b3_int = 3 * b if b3_elem is None else None

    def _elem_shape(self):
        return tuple(jnp.shape(self.F.one))

    def _mul_b3(self, x):
        if self.b3_elem is not None:
            return self.F.mul(x, self.b3_elem)
        return self.F.mul_small(x, self.b3_int)

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
        """(0 : 1 : 0)."""
        F = self.F
        zero = jnp.zeros_like(F.one)
        pt = self.stack(zero, F.one, zero)
        return jnp.broadcast_to(pt, tuple(batch_shape) + pt.shape)

    def is_infinity(self, pt):
        _, _, z = self.coords(pt)
        return self.F.is_zero(z)

    def _sel(self, c, a, b):
        """c ? a : b with c of batch shape, a/b points."""
        cexp = c[(...,) + (None,) * (1 + self.edims)]
        return jnp.where(cexp, a, b)

    # ------------------------------------------------------------ group law

    def add(self, p, q):
        """Complete addition (RC15 alg. 7, a=0): 12M + 2·(3b) in 2 layers."""
        p, q = jnp.broadcast_arrays(p, q)
        x1, y1, z1 = self.coords(p)
        x2, y2, z2 = self.coords(q)
        x3, y3, z3 = self.add_xyz(x1, y1, z1, x2, y2, z2)
        return self.stack(x3, y3, z3)

    def add_xyz(self, x1, y1, z1, x2, y2, z2):
        """RC15 complete add on separate coordinate arrays.  Lets callers
        with non-(…,3,L) point layouts (e.g. the MSM fold's flat (…,3·L)
        rows) run the group law without stack/slice relayouts, which cost
        more than the adds themselves at 2^20 MSM shapes (PERFNOTES)."""
        F = self.F
        # Layer 1: six independent products.
        l1a = jnp.stack(
            [x1, y1, z1, F.add(x1, y1), F.add(y1, z1), F.add(x1, z1)], 0
        )
        l1b = jnp.stack(
            [x2, y2, z2, F.add(x2, y2), F.add(y2, z2), F.add(x2, z2)], 0
        )
        m = F.mul(l1a, l1b)
        t0, t1, t2 = m[0], m[1], m[2]
        t3 = F.sub(m[3], F.add(t0, t1))  # X1Y2 + X2Y1
        t4 = F.sub(m[4], F.add(t1, t2))  # Y1Z2 + Y2Z1
        ty = F.sub(m[5], F.add(t0, t2))  # X1Z2 + X2Z1
        t0_3 = F.add(F.double(t0), t0)  # 3·X1X2
        t2b = self._mul_b3(t2)  # 3b·Z1Z2
        z3l = F.add(t1, t2b)  # Y1Y2 + 3bZ1Z2
        t1m = F.sub(t1, t2b)  # Y1Y2 - 3bZ1Z2
        yb = self._mul_b3(ty)  # 3b·(X1Z2+X2Z1)
        # Layer 2: six independent products.
        l2a = jnp.stack([t3, t4, yb, t1m, t0_3, z3l], 0)
        l2b = jnp.stack([t1m, yb, t0_3, z3l, t3, t4], 0)
        if hasattr(F, "mul_lazy"):
            # Lazy reduction: combine product residues first, then run the
            # three Montgomery reductions instead of six.
            dm = F.mul_lazy(l2a, l2b)
            comb = jnp.stack(
                [
                    F.lazy_sub(dm[0], dm[1]),  # t3·t1m − t4·yb
                    F.lazy_add(dm[3], dm[2]),  # t1m·z3l + yb·t0_3
                    F.lazy_add(dm[5], dm[4]),  # z3l·t4 + t0_3·t3
                ],
                0,
            )
            out = F.reduce_d(comb)
            return out[0], out[1], out[2]
        mm = F.mul(l2a, l2b)
        x3 = F.sub(mm[0], mm[1])  # t3·t1m − t4·yb
        y3 = F.add(mm[3], mm[2])  # t1m·z3l + yb·t0_3
        z3 = F.add(mm[5], mm[4])  # z3l·t4 + t0_3·t3
        return x3, y3, z3

    def double(self, pt):
        """Complete doubling (RC15 alg. 9, a=0): 8M + 1·(3b) in 2 layers."""
        F = self.F
        x, y, z = self.coords(pt)
        # Layer 1: Y², YZ, Z², XY.
        m = F.mul(jnp.stack([y, y, z, x], 0), jnp.stack([y, z, z, y], 0))
        t0, t1, zz, xy = m[0], m[1], m[2], m[3]
        z8 = F.double(F.double(F.double(t0)))  # 8Y²
        t2 = self._mul_b3(zz)  # 3b·Z²
        y3l = F.add(t0, t2)  # Y² + 3bZ²
        t0m = F.sub(t0, F.add(F.double(t2), t2))  # Y² − 9bZ²
        # Layer 2: t2·8Y², YZ·8Y², (Y²−9bZ²)·(Y²+3bZ²), (Y²−9bZ²)·XY.
        l2a = jnp.stack([t2, t1, t0m, t0m], 0)
        l2b = jnp.stack([z8, z8, y3l, xy], 0)
        if hasattr(F, "mul_lazy"):
            dm = F.mul_lazy(l2a, l2b)
            comb = jnp.stack(
                [F.lazy_double(dm[3]), F.lazy_add(dm[2], dm[0]), dm[1]], 0
            )
            out = F.reduce_d(comb)
            return self.stack(out[0], out[1], out[2])
        mm = F.mul(l2a, l2b)
        y3 = F.add(mm[2], mm[0])  # (Y²−9bZ²)(Y²+3bZ²) + 24bY²Z²
        x3 = F.double(mm[3])  # 2XY(Y²−9bZ²)
        z3 = mm[1]  # 8Y³Z
        return self.stack(x3, y3, z3)

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

    def scalar_mul_bits_batched(self, pt, bits):
        """Per-lane scalar mul: pt batch+(3,)+elem, bits batch+(nbits,) with
        one scalar per batch lane.  MSB-first double-and-add scan."""

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, pt)
            acc = self._sel(bit.astype(bool), added, acc)
            return acc, None

        bits_t = jnp.moveaxis(bits, -1, 0)[::-1]
        init = self.infinity(self.batch_shape(pt))
        acc, _ = jax.lax.scan(body, init, bits_t)
        return acc

    def msm_windowed(self, pts, digits, c: int = 4):
        """Windowed multi-scalar mul with SHARED doublings across all bases —
        the verify-path MSM (tens of bases, one result).

        pts:    (..., n, 3) + elem — projective bases
        digits: (..., n, nw) uint32 — c-bit scalar digits, LSB-first windows

        acc = Σ_w 2^(c·w) · Σ_i digits[i,w] · pts[i], evaluated MSB-window
        first with c doublings of the single accumulator per window and a
        per-window table gather + tree-sum over bases.  ~6x fewer EC-op
        instances than a per-base double-add ladder (254·2·n → ~(2^c-2+nw)·n),
        mirroring the shared-window structure of the reference Pippenger
        (/root/reference/snark-verifier/src/util/msm.rs:238-283) at
        verify-path sizes."""
        import jax

        import jax

        n_axis = pts.ndim - 2 - self.edims  # axis holding the base count
        # multiples table T[d] = d·pt, d = 0..2^c-1: stacked at a new axis
        # right after the base axis -> (..., n, 2^c, 3) + elem.  Built as a
        # scan (one compiled add body), not an unrolled chain — keeps the
        # verify-graph compile surface small.
        def tab_body(acc, _):
            nxt = self.add(acc, pts)
            return nxt, nxt

        inf = self.infinity(self.batch_shape(pts))
        _, rest = jax.lax.scan(tab_body, pts, None, length=2 ** c - 2)
        rest = jnp.moveaxis(rest, 0, n_axis + 1)
        tab = jnp.concatenate(
            [inf[..., None, :, :] if self.edims == 1 else inf[..., None, :, :, :],
             pts[..., None, :, :] if self.edims == 1 else pts[..., None, :, :, :],
             rest],
            axis=n_axis + 1,
        )

        def body(acc, dig):
            for _ in range(c):
                acc = self.double(acc)
            idx = dig[(...,) + (None,) * (2 + self.edims)].astype(jnp.int32)
            sel = jnp.take_along_axis(tab, idx, axis=n_axis + 1)
            sel = jnp.squeeze(sel, axis=n_axis + 1)
            acc = self.add(acc, self.tree_sum(sel, axis=n_axis))
            return acc, None

        digs = jnp.moveaxis(digits, -1, 0)[::-1]  # MSB window first
        init = self.infinity(self.batch_shape(pts)[:-1])
        acc, _ = jax.lax.scan(body, init, digs)
        return acc

    def tree_sum(self, pts, axis: int = 0):
        """Sum a stack of points along `axis` by halving folds."""
        pts = jnp.moveaxis(pts, axis, 0)
        width = pts.shape[0]
        while width > 1:
            half = width // 2
            lo, hi = pts[:half], pts[half:width]
            if lo.shape[0] != hi.shape[0]:
                pts = jnp.concatenate([self.add(lo, hi[: lo.shape[0]]), hi[lo.shape[0] :]], 0)
            else:
                pts = self.add(lo, hi)
            width = pts.shape[0]
        return pts[0]

    # -------------------------------------------------------------- affine

    def to_affine(self, pt):
        """Device-side normalization: returns (x, y, is_inf)."""
        F = self.F
        x, y, z = self.coords(pt)
        zinv = F.inv(z)
        return F.mul(x, zinv), F.mul(y, zinv), F.is_zero(z)

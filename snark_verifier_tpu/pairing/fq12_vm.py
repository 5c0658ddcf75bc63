"""Fq12 straight-line-program VM: run an instruction tape under one lax.scan.

Motivation (TPU/XLA): the final-exponentiation hard part is an irregular
~200-step chain of Fq12 mul/square/frobenius/conjugate.  Emitting each step
as its own XLA op made compile time explode (hundreds of nested while-loops).
Instead we express the chain as DATA — a tape of register-machine
instructions — and scan ONE uniform body over it:

    t      = transform(R[src1])     # per-step (conj?, per-coord Fq2 coeffs)
    R[dst] = t * R[src2]            # one batched Fq12 multiply

The transform generalizes identity / conjugate / frobenius^k: each of the six
Fq2 coordinates is optionally Fq2-conjugated then multiplied by a per-step
coefficient (1, ±1, or a Frobenius constant).  Multiplication by the
always-ONE register makes pure transforms and square-chain padding uniform.

Register file: (NREG, 2, 3, 2, 16) + leading batch dims.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.spec import FQ
from ..tower import FQ2, FQ12
from ..tower.encode import _fq_mont
from . import py_pairing as pp

NREG = 8
# register aliases
R_ONE = 0  # always holds 1


def _coeff_identity():
    one = (1, 0)
    return [one] * 6


def _coeff_conj12():
    # conjugate in Fq12 = negate the c1 (w) part: coords 3,4,5 scaled by -1
    one, neg1 = (1, 0), (FQ.p - 1, 0)
    return [one, one, one, neg1, neg1, neg1]


def _coeff_frob(power: int):
    c1 = pp.FROB_FQ6_C1[power % 6]
    c2 = pp.FROB_FQ6_C2[power % 6]
    c12 = pp.FROB_FQ12_C1[power % 12]
    # coords: c0 = (x0, x1 v, x2 v²), c1-part coords scaled additionally by c12
    f2m = pp.f2_mul
    return [
        (1, 0),
        c1,
        c2,
        c12,
        f2m(c1, c12),
        f2m(c2, c12),
    ]


class TapeBuilder:
    """Host-side builder translating a straight-line program into tape arrays."""

    def __init__(self):
        self.src1: List[int] = []
        self.src2: List[int] = []
        self.dst: List[int] = []
        self.conj: List[bool] = []  # apply Fq2-conj to every coordinate
        self.coeffs: List = []  # per-step [6 x Fq2 int tuple]

    def emit(self, dst: int, src1: int, src2: int = R_ONE, conj: bool = False,
             coeffs=None):
        self.src1.append(src1)
        self.src2.append(src2)
        self.dst.append(dst)
        self.conj.append(conj)
        self.coeffs.append(coeffs or _coeff_identity())

    # convenience ops (dst <- op(...))
    def mul(self, dst, a, b):
        self.emit(dst, a, b)

    def square(self, dst, a):
        self.emit(dst, a, a)

    def conj12(self, dst, a):
        self.emit(dst, a, R_ONE, conj=False, coeffs=_coeff_conj12())

    def frob(self, dst, a, power: int):
        self.emit(dst, a, R_ONE, conj=bool(power % 2), coeffs=_coeff_frob(power))

    def pow_x(self, dst, base, x: int):
        """dst <- base^x via square-and-multiply (dst must differ from base)."""
        bits = bin(x)[2:]
        self.mul(dst, base, R_ONE)  # dst = base (covers leading 1 bit)
        for b in bits[1:]:
            self.square(dst, dst)
            self.mul(dst, dst, base if b == "1" else R_ONE)

    def arrays(self):
        n = len(self.dst)
        coeff_arr = np.zeros((n, 6, 2, 16), np.uint32)
        for i, cs in enumerate(self.coeffs):
            for j, c in enumerate(cs):
                coeff_arr[i, j, 0] = _fq_mont(c[0])
                coeff_arr[i, j, 1] = _fq_mont(c[1])
        # pure numpy so results are safe to lru_cache and to reference from
        # inside jit traces
        return (
            np.array(self.src1, np.int32),
            np.array(self.src2, np.int32),
            np.array(self.dst, np.int32),
            np.array(self.conj, np.bool_),
            coeff_arr,
        )


def run_tape(regs, tape, rt=None):
    """regs: (..., NREG, 2, 3, 2, W); returns updated registers.

    rt: an RnsTower (tower/rns_tower.py) to run the tape on the RNS/MXU
    backend — regs must then be RNS-form (W=35); the positional Montgomery
    coeff constants are converted once before the scan."""
    src1, src2, dst, conj, coeffs = tape
    nbatch = regs.ndim - 5

    if rt is not None:
        tape = (src1, src2, dst, conj, rt.from_limbs(coeffs))

        def body_rns(R, step):
            s1, s2, d, cj, co = step
            a = jnp.take(R, s1, axis=nbatch)
            b = jnp.take(R, s2, axis=nbatch)
            out = rt.transform_mul(a, cj, co, b)
            R = jax.lax.dynamic_update_index_in_dim(R, out, d, axis=nbatch)
            return R, None

        regs, _ = jax.lax.scan(body_rns, regs, tape)
        return regs

    def body(R, step):
        s1, s2, d, cj, co = step
        a = jnp.take(R, s1, axis=nbatch)
        b = jnp.take(R, s2, axis=nbatch)
        # transform a: per-coordinate optional conj + Fq2 coeff multiply
        flat = a.reshape(a.shape[:-4] + (6, 2, 16))  # six Fq2 coords
        conjed = FQ2.conj(flat)
        flat = jnp.where(cj, conjed, flat)
        flat = FQ2.mul(flat, co)
        t = flat.reshape(a.shape)
        out = FQ12.mul(t, b)
        R = jax.lax.dynamic_update_index_in_dim(R, out, d, axis=nbatch)
        return R, None

    regs, _ = jax.lax.scan(body, regs, tape)
    return regs


def build_final_exp_tape():
    """Full post-inv tape.  Precondition: R[1] = conj(f)·f^{-1} (=: m).
    Postcondition: R[1] = final exponentiation result."""
    t = TapeBuilder()
    M, A, B, C, E, T = 1, 2, 3, 4, 5, 6
    x = pp.X
    # easy part tail: m = frob2(m) * m
    t.frob(A, M, 2)
    t.mul(M, A, M)
    # fu = m^x (A), fu2 = fu^x (B), fu3 = fu2^x (C)
    t.pow_x(A, M, x)
    t.pow_x(B, A, x)
    t.pow_x(C, B, x)
    # y6 = conj(fu3 * frob1(fu3)) -> C
    t.frob(T, C, 1)
    t.mul(C, C, T)
    t.conj12(C, C)
    # t0 = y6^2 * y4 * y5 ;  y4 = conj(fu * frob1(fu2)), y5 = conj(fu2)
    t.square(C, C)            # C = y6²
    t.frob(T, B, 1)           # T = frob1(fu2)
    t.mul(T, A, T)
    t.conj12(T, T)            # T = y4
    t.mul(C, C, T)            # C = y6²·y4
    t.conj12(E, B)            # E = y5 = conj(fu2)
    t.mul(C, C, E)            # C = t0 = y6²·y4·y5
    # t1 = y3 * y5 * t0 ; y3 = conj(frob1(fu))
    t.frob(T, A, 1)
    t.conj12(T, T)            # T = y3
    t.mul(T, T, E)            # T = y3·y5
    t.mul(T, T, C)            # T = t1
    # t0 = t0 * y2 ; y2 = frob2(fu2)
    t.frob(E, B, 2)           # E = y2
    t.mul(C, C, E)            # C = t0·y2
    # t1 = t1² · t0 ; t1 = t1²
    t.square(T, T)
    t.mul(T, T, C)
    t.square(T, T)
    # t0' = t1 * y1 ; y1 = conj(m)
    t.conj12(E, M)            # E = y1
    t.mul(E, T, E)            # E = t0'
    # t1 = t1 * y0 ; y0 = fp·fp2·fp3 of m
    t.frob(A, M, 1)           # A = fp  (fu no longer needed)
    t.frob(B, M, 2)           # B = fp2
    t.mul(A, A, B)
    t.frob(B, B, 1)           # B = fp3
    t.mul(A, A, B)            # A = y0
    t.mul(T, T, A)            # T = t1·y0
    # result = (t0')² * t1
    t.square(E, E)
    t.mul(M, E, T)
    return t.arrays()

"""Device BN254 pairing: Miller loop over precomputed lines + final exp.

The KZG decider's G2 arguments (g2, s·g2) are fixed SRS points, so line
coefficients are precomputed host-side (py_pairing.prepare_g2) and the device
Miller loop is pure Fq12 arithmetic: one lax.scan over the 64 NAF steps whose
body is a square + (sparse) line multiplications, batchable over both the
pair axis and any proof-batch leading dims.

Mirrors the role of halo2curves' multi_miller_loop + final_exponentiation as
used by the reference decider (/root/reference/snark-verifier/src/pcs/kzg/
decider.rs:60-80).  The final exponentiation uses the easy part followed by
the standard BN hard-part addition chain, validated against the oracle's
direct (p^12-1)/r pow in tests.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import FQ_FIELD
from ..ff.spec import BN254_X
from ..tower import FQ2, FQ6, FQ12, fq2_from_int
from ..tower.encode import _fq_mont
from . import py_pairing as pp

F = FQ_FIELD


# ------------------------------------------------------- host preparation


def prepare_pairs(pairs) -> Tuple:
    """Host: [(G1 affine int tuple, G2 affine int tuple)] -> device arrays.

    Returns (xs, ys, dbl, addc, has_add, finals):
      xs, ys  : (npairs, 16) Fq Montgomery
      dbl     : (steps, npairs, 3, 2, 16) doubling-line coeffs
      addc    : (steps, npairs, 3, 2, 16) addition-line coeffs (zeros if none)
      has_add : (steps,) bool
      finals  : (2, npairs, 3, 2, 16) frobenius end-step coeffs
    """
    npairs = len(pairs)
    xs = np.stack([_fq_mont(p[0][0]) for p in pairs])
    ys = np.stack([_fq_mont(p[0][1]) for p in pairs])

    all_coeffs = [pp.prepare_g2(q) for _, q in pairs]
    digits = list(reversed(pp.NAF_DIGITS[:-1]))
    steps = len(digits)

    def c_arr(c):
        # pure numpy: prepare_pairs may run lazily inside a jit trace
        return np.stack(
            [np.stack([_fq_mont(x[0]), _fq_mont(x[1])]) for x in c]
        )  # (3,2,16)

    dbl = np.zeros((steps, npairs, 3, 2, 16), np.uint32)
    addc = np.zeros((steps, npairs, 3, 2, 16), np.uint32)
    has_add = np.zeros((steps,), np.bool_)
    finals = np.zeros((2, npairs, 3, 2, 16), np.uint32)
    idx = [0] * npairs
    for i, d in enumerate(digits):
        for k in range(npairs):
            kind, c = all_coeffs[k][idx[k]]
            assert kind == "dbl"
            idx[k] += 1
            dbl[i, k] = c_arr(c)
        if d != 0:
            has_add[i] = True
            for k in range(npairs):
                kind, c = all_coeffs[k][idx[k]]
                assert kind == "add"
                idx[k] += 1
                addc[i, k] = c_arr(c)
    for j in range(2):
        for k in range(npairs):
            kind, c = all_coeffs[k][idx[k]]
            idx[k] += 1
            finals[j, k] = c_arr(c)
    return (xs, ys, dbl, addc, has_add, finals)


def prepare_g2_coeffs(qs) -> Tuple:
    """Host: fixed G2 points only -> (dbl, addc, has_add, finals) with the
    same layout as `prepare_pairs` (G1 side supplied on device at runtime)."""
    fake_g1 = (1, 2)
    _, _, dbl, addc, has_add, finals = prepare_pairs([(fake_g1, q) for q in qs])
    return dbl, addc, has_add, finals


# ---------------------------------------------------------- device kernels


def _mul_lines(f, coeffs, xs, ys, zs=None):
    """f *= Π_k line_k.  coeffs (..., npairs, 3, 2, 16); xs, ys (..., npairs, 16).

    zs: optional projective Z per pair.  Lines are evaluated at the
    PROJECTIVE point by scaling the whole line by Z (ℓ·Z = c·Y + c·X·w +
    c·Z·vw): the spurious Π Z factor lies in Fq, which the easy part of the
    final exponentiation annihilates (a^(p^6-1)=1 for a ∈ Fq) — this
    removes the per-element inversion `G1.to_affine` needs (a 254-step
    dispatch-bound pow scan, 63ms of a 203ms batch-256 decide)."""
    npairs = coeffs.shape[-4]
    for k in range(npairs):
        c = coeffs[..., k, :, :, :]
        c0 = FQ2.smul(c[..., 0, :, :], ys[..., k, :])
        c3 = FQ2.smul(c[..., 1, :, :], xs[..., k, :])
        c4 = c[..., 2, :, :]
        if zs is not None:
            c4 = FQ2.smul(c4, zs[..., k, :])
        f = FQ12.mul_by_034(f, c0, c3, c4)
    return f


def miller_loop(xs, ys, dbl, addc, has_add, finals, rns: bool = False,
                zs=None):
    """Multi-Miller loop.  Leading batch dims on xs/ys broadcast into f.

    rns=True runs the whole loop on the RNS/MXU tower (tower/rns_tower.py):
    the positional Montgomery inputs (points + precomputed line coeffs) are
    converted at the graph edge by one batched base-extension matmul.
    zs: projective Z coords (see _mul_lines)."""
    batch_shape = xs.shape[:-2]
    if rns:
        rt = _rt()
        xs, ys = rt.from_limbs(xs), rt.from_limbs(ys)
        if zs is not None:
            zs = rt.from_limbs(zs)
        dbl, addc = rt.from_limbs(dbl), rt.from_limbs(addc)
        finals = rt.from_limbs(finals)
        one = jnp.asarray(rt.one12)
        f0 = jnp.broadcast_to(one, batch_shape + one.shape)

        def body(f, step):
            dc, ac, ha = step
            f = rt.square12(f)
            f = _mul_lines_rns(rt, f, dc, xs, ys, zs)
            fa = _mul_lines_rns(rt, f, ac, xs, ys, zs)
            f = rt.select12(jnp.broadcast_to(ha, batch_shape), fa, f)
            return f, None

        f, _ = jax.lax.scan(body, f0, (dbl, addc, has_add))
        f = _mul_lines_rns(rt, f, finals[0], xs, ys, zs)
        f = _mul_lines_rns(rt, f, finals[1], xs, ys, zs)
        return f
    f0 = jnp.broadcast_to(FQ12.one, batch_shape + FQ12.one.shape)

    def body(f, step):
        dc, ac, ha = step
        f = FQ12.square(f)
        f = _mul_lines(f, dc, xs, ys, zs)
        fa = _mul_lines(f, ac, xs, ys, zs)
        f = FQ12.select(jnp.broadcast_to(ha, batch_shape), fa, f)
        return f, None

    f, _ = jax.lax.scan(body, f0, (dbl, addc, has_add))
    f = _mul_lines(f, finals[0], xs, ys, zs)
    f = _mul_lines(f, finals[1], xs, ys, zs)
    return f


def _pairing_rns_default() -> bool:
    """RNS/MXU tower for the pairing: default ON on real TPU backends
    (PAIRING_RNS=0/1 overrides)."""
    env = os.environ.get("PAIRING_RNS")
    if env is not None:
        return env.strip().lower() not in ("", "0", "false", "off", "no")
    return jax.default_backend() != "cpu"


def _rt():
    from ..tower.rns_tower import get_rns_tower

    return get_rns_tower()


def _mul_lines_rns(rt, f, coeffs, xs, ys, zs=None):
    """RNS variant of _mul_lines (coeffs (..., npairs, 3, 2, 35))."""
    npairs = coeffs.shape[-4]
    for k in range(npairs):
        c = coeffs[..., k, :, :, :]
        c0 = rt.smul2(c[..., 0, :, :], ys[..., k, :])
        c3 = rt.smul2(c[..., 1, :, :], xs[..., k, :])
        c4 = c[..., 2, :, :]
        if zs is not None:
            c4 = rt.smul2(c4, zs[..., k, :])
        f = rt.mul_by_034(f, c0, c3, c4)
    return f


@functools.lru_cache(maxsize=None)
def _frob_consts(power: int):
    # pure numpy: safe to cache and to call from inside a jit trace
    def enc(c):
        return np.stack([_fq_mont(c[0]), _fq_mont(c[1])])

    return (
        enc(pp.FROB_FQ6_C1[power % 6]),
        enc(pp.FROB_FQ6_C2[power % 6]),
        enc(pp.FROB_FQ12_C1[power % 12]),
    )


def _f2_frob(a, power):
    return FQ2.conj(a) if power % 2 else a


def f12_frobenius(a, power: int):
    """Frobenius a^(p^power) on Fq12 limb arrays."""
    k1, k2, k12 = _frob_consts(power)
    c0 = a[..., 0, :, :, :]
    c1 = a[..., 1, :, :, :]

    def f6_frob(x):
        y0 = _f2_frob(x[..., 0, :, :], power)
        y1 = FQ2.mul(_f2_frob(x[..., 1, :, :], power), k1)
        y2 = FQ2.mul(_f2_frob(x[..., 2, :, :], power), k2)
        return FQ6.make(y0, y1, y2)

    d0 = f6_frob(c0)
    d1 = f6_frob(c1)
    d1 = FQ6.make(
        FQ2.mul(d1[..., 0, :, :], k12),
        FQ2.mul(d1[..., 1, :, :], k12),
        FQ2.mul(d1[..., 2, :, :], k12),
    )
    return FQ12.make(d0, d1)


def final_exponentiation(f, rns: bool = False):
    """(p^12-1)/r: easy-part inversion + the whole remaining chain executed as
    an instruction tape under one lax.scan (pairing/fq12_vm.py) — keeps the
    XLA graph to a handful of op instances.  Validated against the oracle's
    direct pow in tests.

    rns=True: the tape runs on the RNS tower; the one inversion of the easy
    part round-trips through the positional core (a single Fq12 inv per
    batch is noise next to the ~250-step tape)."""
    from .fq12_vm import NREG, build_final_exp_tape, run_tape

    if rns:
        rt = _rt()
        fl = rt.to_limbs12(f)
        m = FQ12.mul(FQ12.conj(fl), FQ12.inv(fl))  # f^(p^6 - 1), positional
        m = rt.from_limbs(m)
        batch = m.shape[:-4]
        one = jnp.broadcast_to(jnp.asarray(rt.one12), batch + rt.one12.shape)
        regs = jnp.stack([one, m] + [one] * (NREG - 2), axis=len(batch))
        regs = run_tape(regs, _final_exp_tape(), rt=rt)
        return jnp.take(regs, 1, axis=len(batch))

    m = FQ12.mul(FQ12.conj(f), FQ12.inv(f))  # f^(p^6 - 1)
    batch = m.shape[:-4]
    one = jnp.broadcast_to(FQ12.one, batch + FQ12.one.shape)
    regs = jnp.stack([one, m] + [one] * (NREG - 2), axis=len(batch))
    regs = run_tape(regs, _final_exp_tape())
    return jnp.take(regs, 1, axis=len(batch))


@functools.lru_cache(maxsize=None)
def _final_exp_tape():
    from .fq12_vm import build_final_exp_tape

    return build_final_exp_tape()


def pairing_check(xs, ys, dbl, addc, has_add, finals, rns: bool | None = None,
                  zs=None):
    """Π e(Pᵢ, Qᵢ) == 1 as a device bool (batch dims broadcast from xs/ys).

    zs: optional projective Z per pair — inversion-free line evaluation
    (see _mul_lines; valid because the final exponentiation kills Fq
    factors)."""
    if rns is None:
        rns = _pairing_rns_default()
    f = miller_loop(xs, ys, dbl, addc, has_add, finals, rns=rns, zs=zs)
    fe = final_exponentiation(f, rns=rns)
    return _rt().is_one12(fe) if rns else FQ12.is_one(fe)

"""ctypes bindings for the native C++ BN254 core (csrc/bn254.cpp).

Builds the shared library on first use (g++, cached as csrc/libbn254.so).
Used for fast host-side SRS generation / commitments / MSM and as an
independent oracle; falls back cleanly if no compiler is available
(`available()` returns False and callers use the python-int paths).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from ..ff.spec import FQ, FR

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB = os.path.join(_CSRC, "libbn254.so")


def _limbs64(x: int) -> np.ndarray:
    return np.array([(x >> (64 * i)) & ((1 << 64) - 1) for i in range(4)], np.uint64)


def _from64(a) -> int:
    return sum(int(v) << (64 * i) for i, v in enumerate(a))


@functools.lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            os.path.join(_CSRC, "bn254.cpp")
        ):
            subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None
    R = 1 << 256

    def mont_params(p):
        r2 = _limbs64(R * R % p)
        ninv = (-pow(p, -1, 1 << 64)) % (1 << 64)
        one = _limbs64(R % p)
        return _limbs64(p), r2, ninv, one

    qp, qr2, qninv, qone = mont_params(FQ.p)
    rp, rr2, rninv, rone = mont_params(FR.p)
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
    lib.bn254_init.argtypes = [u64p, u64p, ctypes.c_uint64, u64p] * 2
    lib.bn254_init(qp, qr2, qninv, qone, rp, rr2, rninv, rone)
    lib.bn254_msm.argtypes = [u64p, u64p, ctypes.c_long, u64p]
    lib.bn254_scalar_mul.argtypes = [u64p, u64p, u64p]
    lib.bn254_srs_powers.argtypes = [u64p, u64p, ctypes.c_long, u64p]
    lib.bn254_enumerate_points.argtypes = [u64p, ctypes.c_long, u64p]
    lib.bn254_fe_mul_batch.argtypes = [ctypes.c_int, u64p, u64p, u64p, ctypes.c_long]
    lib.bn254_fe_inv_batch.argtypes = [ctypes.c_int, u64p, u64p, ctypes.c_long]
    lib.bn254_msm_mt.argtypes = [u64p, u64p, ctypes.c_long, ctypes.c_int, u64p]
    i32nd = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.bn254_slot_indices.argtypes = [
        u64p, ctypes.c_long, ctypes.c_int, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, i32nd, i32nd, i32nd, ctypes.c_int,
    ]
    return lib


def available() -> bool:
    return _load() is not None


def _enc_point(pt) -> np.ndarray:
    """affine int tuple (or None) -> 12 u64 Montgomery projective limbs."""
    R = 1 << 256
    out = np.zeros(12, np.uint64)
    if pt is None:
        out[4:8] = _limbs64(R % FQ.p)  # (0:1:0)
        return out
    out[0:4] = _limbs64(pt[0] * R % FQ.p)
    out[4:8] = _limbs64(pt[1] * R % FQ.p)
    out[8:12] = _limbs64(R % FQ.p)
    return out


def _dec_point(buf) -> Optional[Tuple[int, int]]:
    Rinv = pow(1 << 256, -1, FQ.p)
    x = _from64(buf[0:4]) * Rinv % FQ.p
    y = _from64(buf[4:8]) * Rinv % FQ.p
    z = _from64(buf[8:12]) * Rinv % FQ.p
    if z == 0:
        return None
    zi = pow(z, -1, FQ.p)
    return (x * zi % FQ.p, y * zi % FQ.p)


def msm(points: List, scalars: List[int]):
    """Native Pippenger MSM over affine int points; returns affine tuple."""
    lib = _load()
    assert lib is not None
    n = len(points)
    pts = np.concatenate([_enc_point(p) for p in points])
    scs = np.concatenate([_limbs64(int(s) % FR.p) for s in scalars])
    out = np.zeros(12, np.uint64)
    lib.bn254_msm(np.ascontiguousarray(pts), np.ascontiguousarray(scs), n, out)
    return _dec_point(out)


def msm_mt_dev(points_u64: np.ndarray, scalars_u64: np.ndarray,
               nthreads: int = 0):
    """Multithreaded Pippenger on pre-encoded buffers (n*12 / n*4 u64 limbs,
    Montgomery projective points, plain scalars) — the measured CPU baseline
    (reference rayon MSM analogue, util/msm.rs:290-310).  Returns the 12-limb
    result buffer."""
    lib = _load()
    assert lib is not None
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    n = len(scalars_u64) // 4
    out = np.zeros(12, np.uint64)
    lib.bn254_msm_mt(
        np.ascontiguousarray(points_u64), np.ascontiguousarray(scalars_u64),
        n, nthreads, out,
    )
    return out


def msm_mt(points: List, scalars: List[int], nthreads: int = 0):
    """Multithreaded MSM over affine int points; returns affine tuple."""
    pts = np.concatenate([_enc_point(p) for p in points])
    scs = np.concatenate([_limbs64(int(s) % FR.p) for s in scalars])
    return _dec_point(msm_mt_dev(pts, scs, nthreads))


def scalar_mul(point, k: int):
    lib = _load()
    assert lib is not None
    out = np.zeros(12, np.uint64)
    lib.bn254_scalar_mul(_enc_point(point), _limbs64(int(k) % FR.p), out)
    return _dec_point(out)


def enumerate_points_dev(n: int):
    """[1..n]*G as a device-ready (n,3,16) uint32 array (bench/test helper).
    Native C++ sequential adds + a pure-numpy limb reshuffle."""
    lib = _load()
    assert lib is not None
    from ..ec.g1 import generator  # noqa: F401 (doc ref)

    out = np.zeros(12 * n, np.uint64)
    lib.bn254_enumerate_points(_enc_point((1, 2)), n, out)
    # u64 Montgomery projective limbs -> 16x16-bit-in-u32 little-endian
    u16 = out.reshape(n, 3, 4).view(np.uint16)  # (n, 3, 16), little-endian
    return u16.astype(np.uint32)


def enumerate_points_raw(n: int) -> np.ndarray:
    """[1..n]*G as the raw n*12 u64 Montgomery projective buffer (the direct
    input format of msm_mt_dev — used by the CPU-baseline bench)."""
    lib = _load()
    assert lib is not None
    out = np.zeros(12 * n, np.uint64)
    lib.bn254_enumerate_points(_enc_point((1, 2)), n, out)
    return out


def srs_powers(g, tau: int, n: int) -> List:
    """[tau^i]G for i in 0..n-1."""
    lib = _load()
    assert lib is not None
    out = np.zeros(12 * n, np.uint64)
    lib.bn254_srs_powers(_enc_point(g), _limbs64(tau % FR.p), n, out)
    return [_dec_point(out[12 * i : 12 * (i + 1)]) for i in range(n)]


def slot_indices(scalars_u64: np.ndarray, c: int, cap: int, trange: int,
                 tcap: int, nthreads: int = 0):
    """Host Pippenger slot assignment (bn254_slot_indices): scalars (n, 4)
    u64 LE -> (idx_main (W-1, 2^c, cap) i32, idx_top (trange, tcap) i32,
    overflow bool), with n as the sentinel index.  Replaces the device prep
    module (digit extract + rank + scatter) whose XLA compile costs ~20 min
    for 0.7s of runtime (PERFNOTES round 3)."""
    lib = _load()
    assert lib is not None
    n = scalars_u64.shape[0]
    W = (256 + c - 1) // c
    nb = 1 << c
    sc = np.ascontiguousarray(scalars_u64.reshape(-1).astype(np.uint64))
    idx_main = np.empty((W - 1) * nb * cap, np.int32)
    idx_top = np.empty(trange * tcap, np.int32)
    ovf = np.zeros(1, np.int32)
    lib.bn254_slot_indices(
        sc, n, c, cap, trange, tcap, idx_main, idx_top, ovf,
        nthreads or (os.cpu_count() or 1),
    )
    return (idx_main.reshape(W - 1, nb, cap), idx_top.reshape(trange, tcap),
            bool(ovf[0]))

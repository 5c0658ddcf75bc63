"""Structured reference string (KZG setup) handling.

Toy trapdoor generation for tests/benches (like the reference's
`IpaProvingKey::rand`, /root/reference/snark-verifier/src/pcs/ipa.rs:229-243)
plus the device-side artifacts the verifier needs: the generator `g` (the
KzgSuccinctVerifyingKey, reference pcs/kzg.rs:21-37) and the prepared pairing
coefficients for (g2, -s_g2) (the KzgDecidingKey, pcs/kzg/decider.rs:6-36).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..ec import py_ec
from ..ff.spec import FR
from ..pairing import py_pairing as pp


@dataclass
class Srs:
    """KZG SRS over BN254: host-int data + lazily-built device artifacts."""

    g1_powers: List  # [τ^i]·G1 affine int tuples, i = 0..n-1
    g2: Tuple  # G2 affine (Fq2 int pair tuple)
    s_g2: Tuple  # [τ]·G2

    @property
    def g(self):
        return self.g1_powers[0]

    def content_hash(self) -> str:
        """Stable digest of the verifier-relevant SRS content (g, g2, s_g2 —
        what the compiled verify graph actually bakes in)."""
        import hashlib

        return hashlib.sha256(repr((self.g, self.g2, self.s_g2)).encode()).hexdigest()

    @functools.cached_property
    def g_dev(self):
        from ..ec.g1 import from_affine_int_np

        # numpy (not jnp): cached values must be trace-safe
        return from_affine_int_np([self.g])[0]

    @functools.cached_property
    def decider_coeffs(self):
        """Prepared Miller-loop coefficients for (g2, -s_g2)."""
        from ..pairing.pairing import prepare_g2_coeffs

        return prepare_g2_coeffs([self.g2, pp.g2_neg(self.s_g2)])

    def g_lagrange(self) -> List:
        """Lagrange-basis commitments [L_i(tau)]G (file-loaded, or derived
        from the toy trapdoor: L_i(tau) = omega^i (tau^n - 1)/(n (tau - omega^i)))."""
        cached = getattr(self, "_g_lagrange", None)
        if cached is not None:
            return cached
        tau = getattr(self, "_tau", None)
        assert tau is not None, "lagrange commitments need a trapdoor or file data"
        from ..utils import native
        from ..verifier.plonk.protocol import Domain

        n = len(self.g1_powers)
        d = Domain.bn254(n.bit_length() - 1)
        znm1 = (pow(tau, n, FR.p) - 1) % FR.p
        smul = native.scalar_mul if native.available() else py_ec.scalar_mul
        out = []
        for i in range(n):
            w = d.rotate(i)
            li = w * znm1 % FR.p * pow(n * (tau - w) % FR.p, -1, FR.p) % FR.p
            out.append(smul(py_ec.G1_GEN, li))
        self._g_lagrange = out
        return out

    def commit(self, coeffs: List[int]):
        """Host commitment: Σ cᵢ·[τ^i]G1 (native C++ MSM when available)."""
        assert len(coeffs) <= len(self.g1_powers), "poly too big for SRS"
        from ..utils import native

        if native.available() and len(coeffs) > 4:
            return native.msm(self.g1_powers[: len(coeffs)], coeffs)
        return py_ec.msm(self.g1_powers[: len(coeffs)], coeffs)


# ------------------------------------------------------- file (de)serialization
#
# halo2 `ParamsKZG::<Bn256>::write(.., SerdeFormat::Processed)` layout
# (the file format the reference's SDK consumes,
# /root/reference/snark-verifier-sdk/src/lib.rs:79-131 params/pk caching):
#   k: u32 LE
#   g:          2^k G1 points, 32B compressed each (halo2curves encoding)
#   g_lagrange: 2^k G1 points, 32B compressed each
#   g2, s_g2:   64B compressed G2 each (x = c0||c1 LE, y-parity in bit 7 of
#               byte 63; infinity = zeros)


def _fq2_sqrt(a):
    """sqrt in Fq2 = Fq(u), u^2 = -1 (complex method); None if non-square."""
    from ..ff.spec import FQ

    q = FQ.p
    c0, c1 = a

    def fq_sqrt(x):
        r = pow(x, (q + 1) // 4, q)  # q = 3 mod 4
        return r if r * r % q == x % q else None

    if c1 == 0:
        r = fq_sqrt(c0)
        if r is not None:
            return (r, 0)
        r = fq_sqrt((-c0) % q)
        return None if r is None else (0, r)
    norm = (c0 * c0 + c1 * c1) % q
    lam = fq_sqrt(norm)
    if lam is None:
        return None
    inv2 = pow(2, -1, q)
    delta = (c0 + lam) * inv2 % q
    x0 = fq_sqrt(delta)
    if x0 is None:
        delta = (c0 - lam) * inv2 % q
        x0 = fq_sqrt(delta)
        if x0 is None:
            return None
    x1 = c1 * pow(2 * x0, -1, q) % q
    return (x0, x1)


def _g2_to_bytes(pt) -> bytes:
    from ..ff.spec import FQ

    if pt is None:
        return bytes(64)
    (x0, x1), (y0, y1) = pt
    b = bytearray(int(x0).to_bytes(32, "little") + int(x1).to_bytes(32, "little"))
    b[63] |= (y0 & 1) << 7
    return bytes(b)


def g2_from_bytes(b: bytes):
    from .. import errors
    from ..ff.spec import FQ

    q = FQ.p
    raw = bytearray(b)
    ysign = raw[63] >> 7
    raw[63] &= 0x7F
    x0 = int.from_bytes(raw[:32], "little")
    x1 = int.from_bytes(raw[32:64], "little")
    if x0 >= q or x1 >= q:
        raise errors.TranscriptError("invalid G2 x encoding")
    if x0 == 0 and x1 == 0 and not ysign:
        return None
    # twist curve y^2 = x^3 + 3/xi over Fq2
    from ..pairing import py_pairing as pp

    x = (x0, x1)
    y2 = pp.f2_add(pp.f2_mul(pp.f2_sq(x), x), pp.B2)
    y = _fq2_sqrt(y2)
    if y is None:
        raise errors.TranscriptError("G2 point not on curve (no sqrt)")
    if (y[0] & 1) != ysign:
        y = pp.f2_neg(y)
    return (x, y)


def save_params(srs: Srs, path: str):
    """Write in the halo2 ParamsKZG 'Processed' layout."""
    from .proof_io import g1_to_bytes

    n = len(srs.g1_powers)
    k = n.bit_length() - 1
    assert 1 << k == n, "SRS size must be a power of two"
    lag = srs.g_lagrange()
    with open(path, "wb") as f:
        f.write(int(k).to_bytes(4, "little"))
        for pt in srs.g1_powers:
            f.write(g1_to_bytes(pt))
        for pt in lag:
            f.write(g1_to_bytes(pt))
        f.write(_g2_to_bytes(srs.g2))
        f.write(_g2_to_bytes(srs.s_g2))


def load_params(path: str) -> Srs:
    """Read a halo2 'Processed'-format ParamsKZG file -> Srs (with on-curve
    validation of every point via decompression)."""
    from .. import errors
    from .proof_io import g1_from_bytes

    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 4:
        raise errors.TranscriptError("SRS file truncated (no header)")
    k = int.from_bytes(data[:4], "little")
    if k > FR.two_adicity:
        raise errors.TranscriptError(f"SRS k={k} exceeds field two-adicity")
    n = 1 << k
    expected = 4 + 2 * n * 32 + 128
    if len(data) != expected:
        raise errors.TranscriptError(
            f"SRS file size {len(data)} != {expected} for k={k}"
        )
    pos = 4
    g1_powers = []
    for _ in range(n):
        g1_powers.append(g1_from_bytes(data[pos : pos + 32]))
        pos += 32
    g_lagrange = []
    for _ in range(n):
        g_lagrange.append(g1_from_bytes(data[pos : pos + 32]))
        pos += 32
    g2 = g2_from_bytes(data[pos : pos + 64])
    s_g2 = g2_from_bytes(data[pos + 64 : pos + 128])
    srs = Srs(g1_powers=g1_powers, g2=g2, s_g2=s_g2)
    srs._g_lagrange = g_lagrange
    return srs


@functools.lru_cache(maxsize=None)
def toy_srs(n: int, seed: int = 0xA11CE) -> Srs:
    """Deterministic toy SRS with known trapdoor (tests/benches only)."""
    import random

    tau = random.Random(seed).randrange(1, FR.p)
    from ..utils import native

    if native.available():
        g1_powers = native.srs_powers(py_ec.G1_GEN, tau, n)
    else:
        g1_powers = [
            py_ec.scalar_mul(py_ec.G1_GEN, pow(tau, i, FR.p)) for i in range(n)
        ]
    g2 = pp.G2_GEN
    s_g2 = pp.g2_scalar_mul(g2, tau)
    srs = Srs(g1_powers=g1_powers, g2=g2, s_g2=s_g2)
    srs._tau = tau
    return srs

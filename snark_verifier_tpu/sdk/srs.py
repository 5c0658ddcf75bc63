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

    def commit(self, coeffs: List[int]):
        """Host commitment: Σ cᵢ·[τ^i]G1 (native C++ MSM when available)."""
        assert len(coeffs) <= len(self.g1_powers), "poly too big for SRS"
        from ..utils import native

        if native.available() and len(coeffs) > 4:
            return native.msm(self.g1_powers[: len(coeffs)], coeffs)
        return py_ec.msm(self.g1_powers[: len(coeffs)], coeffs)


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
    return Srs(g1_powers=g1_powers, g2=g2, s_g2=s_g2)

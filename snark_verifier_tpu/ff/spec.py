"""Field specifications for BN254 (and friends) as fixed 16x16-bit limb planes.

TPU-first design decision: a 254-bit prime-field element is a vector of 16
little-endian 16-bit limbs stored in uint32 lanes.  16x16-bit products fit
exactly in uint32, so schoolbook multiplication + Montgomery reduction need no
64-bit arithmetic anywhere — every op vectorizes over arbitrary leading batch
dimensions on the VPU (and later maps onto int8 MXU matmuls).

Reference parity: the reference re-exports BN254 from `halo2curves`
(/root/reference/snark-verifier/src/lib.rs:16-17) and exposes field utilities
in /root/reference/snark-verifier/src/util/arithmetic.rs (limb split/join at
:262-290 uses LIMBS=3/BITS=88 only at the instance-encoding boundary — that
encoding lives in sdk/, not here).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

# Limb geometry: 16 limbs x 16 bits = 256 bits. Fixed for all fields we host.
W = 16
MASK = (1 << W) - 1
NLIMBS = 16
NBITS = W * NLIMBS


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Little-endian 16-bit limb decomposition as uint32."""
    if x < 0:
        raise ValueError("negative")
    if x >> (W * nlimbs):
        raise ValueError("doesn't fit")
    return np.array([(x >> (W * i)) & MASK for i in range(nlimbs)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    out = 0
    for i, v in enumerate(np.asarray(limbs).reshape(-1)):
        out |= int(v) << (W * i)
    return out


@dataclass(frozen=True)
class FieldSpec:
    """Immutable description of a prime field in 16x16-bit limb form."""

    name: str
    p: int

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p)

    @functools.cached_property
    def r(self) -> int:  # Montgomery radix R = 2^256 mod p
        return (1 << NBITS) % self.p

    @functools.cached_property
    def r2(self) -> int:  # R^2 mod p, for to-Montgomery conversion
        return pow(1 << NBITS, 2, self.p)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2)

    @functools.cached_property
    def r_limbs(self) -> np.ndarray:  # Montgomery form of 1
        return int_to_limbs(self.r)

    @functools.cached_property
    def ninv(self) -> int:  # -p^{-1} mod 2^16
        return (-pow(self.p, -1, 1 << W)) % (1 << W)

    @functools.cached_property
    def num_bits(self) -> int:
        return self.p.bit_length()

    # 2-adicity data for the multiplicative subgroup Domain
    # (reference: util/arithmetic.rs:131-162 root_of_unity at :89-96).
    @functools.cached_property
    def two_adicity(self) -> int:
        s, t = 0, self.p - 1
        while t % 2 == 0:
            s, t = s + 1, t // 2
        return s


# BN254 base field Fq (coordinates) and scalar field Fr (scalars/transcript).
FQ = FieldSpec(
    name="bn254_fq",
    p=21888242871839275222246405745257275088696311157297823662689037894645226208583,
)
FR = FieldSpec(
    name="bn254_fr",
    p=21888242871839275222246405745257275088548364400416034343698204186575808495617,
)

# Curve constants: y^2 = x^3 + 3 over Fq; generator (1, 2).
BN254_B = 3
# BN254 curve parameter x (a.k.a. u); p, r derive from it; used by the pairing.
BN254_X = 4965661367192848881

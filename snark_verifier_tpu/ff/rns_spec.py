"""RNS (residue number system) parameter generation for the MXU field core.

Design (TPU-native; no counterpart in the reference, which uses 64-bit limb
Montgomery arithmetic via halo2curves — /root/reference/snark-verifier/src/
util/arithmetic.rs re-exports):

  * An element of F_p is held as 35 residues: 17 moduli in base A, 17 in
    base B, plus the redundant modulus m_r = 2^16.  All moduli are
    pseudo-Mersenne primes m = 2^16 - c (c < 2^9), so `x mod m` is three
    fold-multiplies by c — and 2^16 ≡ c (mod m) makes byte-recombination
    after matmuls cheap.
  * Multiplication is Montgomery-in-RNS (Bajard/Kawamura "Cox-Rower" style):
      d   = a*b                 (elementwise, all 35 lanes)
      q~  = d * (-p)^-1 mod M   computed in A, base-extended A -> B ∪ {r}
                                WITHOUT the alpha correction (offset
                                tolerant: q~ < k*M)
      r~  = (d + q~*p) / M      (elementwise in B ∪ {r})
      r~ extended B -> A exactly via Shenoy-Kumaresan using the redundant
      residue (beta < k is recovered exactly mod 2^16).
    Output r~ ≡ a*b*M^{-1} (mod p), with r~ < a*b/M + k*p.
  * Base extension sums Σ_i σ_i * T[i,j] are (batch × k) @ (k × k) matmuls
    with SHARED matrices T — the quadratic work of bignum multiplication
    lands on the MXU (uint8 planes, int32 accumulation), while the VPU does
    only ~125 16-bit modmuls per field multiply.

Value-domain bookkeeping: elements are stored in "M-Montgomery form"
(residues of x*M mod p, value < ~20p), so rns_mul(a,b) = a*b*M^{-1} keeps the
form.  Conversions from/to the positional 16-limb representation (which holds
x*R mod p, R = 2^256 — ff/jnp_field.py) go through multiplies by the
precomputed constants M^2*R^{-1} and R^2... see RnsField.

Bounds: M ≈ 2^271.97, p < 2^254, so a*b/M < p whenever a,b < 2^262.9 ≈ 500·p;
mul output < 18p always.  EC formulas never chain enough additions to
approach the ~2^17·p input headroom (asserted in tests via the bound-tracking
debug wrapper).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from .spec import NLIMBS, W, FieldSpec

K = 17  # moduli per base
NRES = 2 * K + 1  # A | B | redundant 2^16
MR = 1 << 16  # redundant modulus (power of two: reduction is a mask)


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for q in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % q == 0:
            return n == q
    # deterministic Miller-Rabin for n < 3.3e24 with these bases
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_moduli(n: int):
    """First n pseudo-Mersenne primes 2^16 - c, c ascending (all c < 2^9;
    only ~23 exist with c < 2^8, so reduction uses three folds)."""
    out = []
    for c in range(3, 512, 2):
        if _is_prime((1 << 16) - c):
            out.append((1 << 16) - c)
            if len(out) == n:
                return out
    raise AssertionError("not enough pseudo-Mersenne primes below 2^16")


@dataclass(frozen=True)
class RnsSpec:
    """All host-precomputed constants for one prime field p."""

    p: int
    mods: np.ndarray  # (35,) uint32: [A (17) | B (17) | 2^16]
    cs: np.ndarray  # (35,) uint32: 2^16 - m < 2^9 (fold constants; c_r = 0)
    M: int  # prod(A)
    M2: int  # prod(B)
    # elementwise constants, one per lane where applicable (uint32 vectors)
    sigma_c: np.ndarray  # (17,) A lanes: (-p)^{-1}*(M/m_i)^{-1} mod m_i
    p_mod: np.ndarray  # (35,) p mod m_j
    minv_b: np.ndarray  # (18,) M^{-1} mod m_j for j in B ∪ {r}
    sigma2_c: np.ndarray  # (17,) B lanes: (M2/m'_j)^{-1} mod m'_j
    m2_mod_a: np.ndarray  # (18,) M2 mod m_i for i in A ∪ {r}  (for -beta*M2)
    m2inv_r: int  # M2^{-1} mod 2^16
    # base-extension matrices (uint32, entries < 2^16)
    T_ab: np.ndarray  # (17, 18): M/m_i mod m'_j for j in B ∪ {r}
    T_ba: np.ndarray  # (17, 18): M2/m'_j mod m_i for i in A ∪ {r}
    # positional <-> RNS
    pow_limbs: np.ndarray  # (16, 35): 2^(16*l) mod m_j
    to_rns_const: np.ndarray  # (35,) residues of M^2 * R^{-1} mod p
    from_rns_const: np.ndarray  # (35,) residues of R mod p (plain value form)
    one_m: np.ndarray  # (35,) residues of M mod p (the M-form "1")
    m2_over: np.ndarray  # (17, 17) uint32 limbs: M2/m'_j as 17 16-bit limbs
    m2_limbs: np.ndarray  # (17,) uint32: M2 as 17 16-bit limbs


@functools.lru_cache(maxsize=None)
def make_rns_spec(p: int) -> RnsSpec:
    mods_list = _gen_moduli(2 * K)
    A = mods_list[:K]
    B = mods_list[K:]
    mods = np.array(A + B + [MR], dtype=np.uint32)
    cs = np.array([(1 << 16) - int(m) for m in A + B] + [0], dtype=np.uint32)
    M = 1
    for m in A:
        M *= m
    M2 = 1
    for m in B:
        M2 *= m
    assert M > (1 << 260) and M2 > (1 << 260)

    sigma_c = np.array(
        [pow(-p, -1, m) * pow(M // m, -1, m) % m for m in A], dtype=np.uint32
    )
    p_mod = np.array([p % int(m) for m in (A + B + [MR])], dtype=np.uint32)
    minv_b = np.array([pow(M, -1, int(m)) for m in B + [MR]], dtype=np.uint32)
    sigma2_c = np.array([pow(M2 // m, -1, m) for m in B], dtype=np.uint32)
    m2_mod_a = np.array([M2 % int(m) for m in A + [MR]], dtype=np.uint32)
    m2inv_r = pow(M2, -1, MR)

    T_ab = np.array(
        [[(M // mi) % int(mj) for mj in B + [MR]] for mi in A], dtype=np.uint32
    )
    T_ba = np.array(
        [[(M2 // mj) % int(mi) for mi in A + [MR]] for mj in B], dtype=np.uint32
    )

    pow_limbs = np.array(
        [[pow(2, 16 * l, int(m)) for m in (A + B + [MR])] for l in range(NLIMBS)],
        dtype=np.uint32,
    )

    def residues(x: int) -> np.ndarray:
        return np.array([x % int(m) for m in (A + B + [MR])], dtype=np.uint32)

    R = 1 << (W * NLIMBS)
    to_rns_const = residues(M * M % p * pow(R, -1, p) % p)
    from_rns_const = residues(R % p)
    one_m = residues(M % p)

    def limbs17(x: int) -> np.ndarray:
        return np.array([(x >> (16 * l)) & 0xFFFF for l in range(17)], dtype=np.uint32)

    m2_over = np.stack([limbs17(M2 // m) for m in B])
    m2_limbs = limbs17(M2)

    return RnsSpec(
        p=p,
        mods=mods,
        cs=cs,
        M=M,
        M2=M2,
        sigma_c=sigma_c,
        p_mod=p_mod,
        minv_b=minv_b,
        sigma2_c=sigma2_c,
        m2_mod_a=m2_mod_a,
        m2inv_r=m2inv_r,
        T_ab=T_ab,
        T_ba=T_ba,
        pow_limbs=pow_limbs,
        to_rns_const=to_rns_const,
        from_rns_const=from_rns_const,
        one_m=one_m,
        m2_over=m2_over,
        m2_limbs=m2_limbs,
    )


def spec_for(field_spec: FieldSpec) -> RnsSpec:
    return make_rns_spec(field_spec.p)

"""Poseidon Fiat–Shamir transcript (device-side, vmappable over proof batch).

Mirrors the reference transcript semantics exactly
(/root/reference/snark-verifier/src/system/halo2/transcript/halo2.rs):
  * common_scalar absorbs the Fr scalar (:209-212)
  * common_ec_point absorbs (x mod r, y mod r) of the affine point — fe_to_fe
    per util/arithmetic.rs:256-258 (:214-226); the identity is invalid
  * squeeze_challenge = Poseidon sponge squeeze (:205-207), T=3 RATE=2
    R_F=8 R_P=57 with the SDK's param choice (snark-verifier-sdk/src/halo2.rs)

Design note (TPU): proofs are parsed host-side into flat arrays of scalars
and affine points (see sdk/proof_io.py); the transcript walks them in stream
order at trace time, so the whole read_proof+verify composes into one jitted
computation, batchable over many proofs via a shared leading batch dim.

fq_to_fr exploits q < 2r: a canonical Fq value is already a valid redundant
[0, 2r] Fr value in our lazy representation, so the conversion is just a
to-Montgomery multiply.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..ff import FQ_FIELD, FR_FIELD
from ..hash.poseidon import PoseidonJax


def fq_to_fr(x_fq_mont):
    """Canonical-value map Fq -> Fr (x mod r), on Montgomery limb arrays."""
    canon = FQ_FIELD.from_mont(x_fq_mont)  # canonical 16-bit limbs, < q < 2r
    return FR_FIELD.to_mont(canon)


class PoseidonTranscript:
    """Reading transcript over pre-parsed proof streams.

    scalars: (..., n_scalars, 16) Fr Montgomery limbs, in stream order.
    points:  (..., n_points, 2, 16) affine (x, y) Fq Montgomery limbs.
    The leading batch shape (if any) must match the sponge's batch shape.
    """

    def __init__(self, scalars=None, points=None, batch_shape=()):
        self.h = PoseidonJax(t=3, rate=2, r_f=8, r_p=57, batch_shape=batch_shape)
        self._scalars = scalars
        self._points = points
        self._si = 0
        self._pi = 0

    # ------------------------------------------------------------- absorbing

    def common_scalar(self, s):
        self.h.update([s])

    def common_ec_point(self, xy):
        """xy: (..., 2, 16) affine point in Fq Montgomery form."""
        self.h.update([fq_to_fr(xy[..., 0, :]), fq_to_fr(xy[..., 1, :])])

    def absorb_ec_points_scanned(self, xy_stack):
        """Absorb a STACK of M affine points (M, ..., 2, 16) as M full
        rate-2 sponge chunks under one lax.scan — bit-identical to M
        common_ec_point calls but with O(1) graph size (the per-point loop
        traces a permutation per point: a 1024-accumulator fold compiled
        for >45 min; the scan compiles in seconds)."""
        chunks = jnp.stack(
            [fq_to_fr(xy_stack[..., 0, :]), fq_to_fr(xy_stack[..., 1, :])],
            axis=-2,
        )
        self.h.update_chunks_scanned(chunks)

    def squeeze_challenge(self):
        return self.h.squeeze()

    # --------------------------------------------------------------- reading

    def read_scalar(self):
        s = self._scalars[..., self._si, :]
        self._si += 1
        self.common_scalar(s)
        return s

    def read_n_scalars(self, n: int) -> List:
        return [self.read_scalar() for _ in range(n)]

    def read_ec_point(self):
        pt = self._points[..., self._pi, :, :]
        self._pi += 1
        self.common_ec_point(pt)
        return pt

    def read_n_ec_points(self, n: int) -> List:
        return [self.read_ec_point() for _ in range(n)]


class PoseidonTranscriptPy:
    """Pure-python-int oracle transcript (host verification / tests).

    Scalars are python ints mod r; points are affine (x, y) int tuples."""

    def __init__(self, scalars: Optional[Sequence[int]] = None,
                 points: Optional[Sequence] = None):
        from ..ff.spec import FR
        from ..hash.poseidon import PoseidonPy

        self.r = FR.p
        self.h = PoseidonPy(t=3, rate=2, r_f=8, r_p=57)
        self._scalars = list(scalars or [])
        self._points = list(points or [])
        self._si = 0
        self._pi = 0

    def common_scalar(self, s: int):
        self.h.update([s % self.r])

    def common_ec_point(self, pt):
        assert pt is not None, "identity point is invalid in transcript"
        x, y = pt
        self.h.update([x % self.r, y % self.r])

    def squeeze_challenge(self) -> int:
        return self.h.squeeze()

    def read_scalar(self) -> int:
        s = self._scalars[self._si]
        self._si += 1
        self.common_scalar(s)
        return s

    def read_ec_point(self):
        pt = self._points[self._pi]
        self._pi += 1
        self.common_ec_point(pt)
        return pt

    def read_n_scalars(self, n: int) -> List[int]:
        return [self.read_scalar() for _ in range(n)]

    def read_n_ec_points(self, n: int) -> List:
        return [self.read_ec_point() for _ in range(n)]

    # prover side: absorb and record the stream (host ints)
    def write_scalar(self, s: int):
        self.common_scalar(s)
        self._scalars.append(s % self.r)

    def write_ec_point(self, pt):
        self.common_ec_point(pt)
        self._points.append(pt)

    def streams(self):
        return list(self._scalars), list(self._points)


class PoseidonTranscriptWriter:
    """Writing transcript (prover side): absorbs and records the stream."""

    def __init__(self, batch_shape=()):
        self.h = PoseidonJax(t=3, rate=2, r_f=8, r_p=57, batch_shape=batch_shape)
        self.scalars: List = []
        self.points: List = []

    def common_scalar(self, s):
        self.h.update([s])

    def common_ec_point(self, xy):
        self.h.update([fq_to_fr(xy[..., 0, :]), fq_to_fr(xy[..., 1, :])])

    def write_scalar(self, s):
        self.common_scalar(s)
        self.scalars.append(s)

    def write_ec_point(self, xy):
        self.common_ec_point(xy)
        self.points.append(xy)

    def squeeze_challenge(self):
        return self.h.squeeze()

    def streams(self):
        sc = jnp.stack(self.scalars, -2) if self.scalars else None
        pt = jnp.stack(self.points, -3) if self.points else None
        return sc, pt

"""EVM (keccak256) Fiat–Shamir transcript.

Mirrors the reference's native EvmTranscript (/root/reference/snark-verifier/
src/system/halo2/transcript/evm.rs:163-244):
  * scalars absorbed as 32 big-endian bytes; points as x||y (64 BE bytes)
  * squeeze: keccak256(buf ++ [0x01 if len(buf)==32]) -> buffer replaced by
    the hash; challenge = hash interpreted big-endian mod r

Two verifier-side execution modes:
  * `EvmTranscriptPy` — host python-int oracle (NativeLoader path).
  * `EvmTranscript` — DEVICE transcript: keccak-f[1600] runs vectorized on
    uint32 lane pairs (hash/keccak_device.py), vmappable over the proof
    batch, so EVM-transcript (on-chain family) proofs get the same
    batch-1024 jitted throughput path as Poseidon ones.
`PrecomputedChallengeTranscript` (host-computed challenge replay) remains as
a fallback / cross-check.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..ff import FR_FIELD
from ..ff.spec import FR
from ..hash.keccak import keccak256


class EvmTranscriptPy:
    """Host keccak transcript over int scalars / affine int points."""

    def __init__(self, scalars: Optional[Sequence[int]] = None, points=None):
        self.buf = b""
        self.r = FR.p
        self._scalars = list(scalars or [])
        self._points = list(points or [])
        self._si = 0
        self._pi = 0
        self.challenges: List[int] = []  # record of squeezed values

    def common_scalar(self, s: int):
        self.buf += (s % self.r).to_bytes(32, "big")

    def common_ec_point(self, pt):
        assert pt is not None, "identity point is invalid in transcript"
        from ..ff.spec import FQ

        x, y = pt
        self.buf += (x % FQ.p).to_bytes(32, "big") + (y % FQ.p).to_bytes(32, "big")

    def squeeze_challenge(self) -> int:
        data = self.buf + (b"\x01" if len(self.buf) == 0x20 else b"")
        h = keccak256(data)
        self.buf = h
        c = int.from_bytes(h, "big") % self.r
        self.challenges.append(c)
        return c

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

    def write_scalar(self, s: int):
        self.common_scalar(s)
        self._scalars.append(s % self.r)

    def write_ec_point(self, pt):
        self.common_ec_point(pt)
        self._points.append(pt)

    def streams(self):
        return list(self._scalars), list(self._points)


class EvmTranscript:
    """Device keccak transcript over pre-parsed proof streams (the batched
    analogue of the reference's native EvmTranscript, transcript/evm.rs:
    163-244).

    scalars: (..., n_scalars, 16) Fr Montgomery limbs, stream order.
    points:  (..., n_points, 2, 16) affine (x, y) Fq Montgomery limbs.

    The buffer is a list of 32-byte big-endian words held as keccak lane
    arrays; squeeze = one device keccak256 over the (statically-shaped)
    buffer, challenge = hash read big-endian, reduced mod r into Montgomery
    form.  All shapes are static per (protocol, batch) pair, so the whole
    read+verify composes into one jitted computation."""

    def __init__(self, scalars=None, points=None, batch_shape=()):
        self._scalars = scalars
        self._points = points
        self._si = 0
        self._pi = 0
        self.batch_shape = tuple(batch_shape)
        self._words = []  # list of (..., 4, 2) uint32 lane arrays

    # ------------------------------------------------------------- absorbing

    def common_scalar(self, s):
        from ..hash.keccak_device import limbs_to_lanes

        self._words.append(limbs_to_lanes(FR_FIELD.from_mont(s)))

    def common_ec_point(self, xy):
        from ..ff import FQ_FIELD
        from ..hash.keccak_device import limbs_to_lanes

        self._words.append(limbs_to_lanes(FQ_FIELD.from_mont(xy[..., 0, :])))
        self._words.append(limbs_to_lanes(FQ_FIELD.from_mont(xy[..., 1, :])))

    def squeeze_challenge(self):
        from ..hash.keccak_device import keccak256_words, lanes_to_limbs

        h = keccak256_words(self._words, batch_shape=self.batch_shape)
        self._words = [h]
        # challenge = hash (big-endian) mod r, delivered in Montgomery form:
        # one Montgomery multiply by R^2 both reduces the 256-bit value and
        # converts it (valid for any 16x16-bit-limb input).
        return FR_FIELD.mul(lanes_to_limbs(h), FR_FIELD.R2)

    # --------------------------------------------------------------- reading

    def read_scalar(self):
        s = self._scalars[..., self._si, :]
        self._si += 1
        self.common_scalar(s)
        return s

    def read_n_scalars(self, n: int):
        return [self.read_scalar() for _ in range(n)]

    def read_ec_point(self):
        pt = self._points[..., self._pi, :, :]
        self._pi += 1
        self.common_ec_point(pt)
        return pt

    def read_n_ec_points(self, n: int):
        return [self.read_ec_point() for _ in range(n)]


class PrecomputedChallengeTranscript:
    """Device-side transcript adapter: reads device proof streams and replays
    a host-computed challenge sequence (one entry per squeeze; each entry an
    int or a per-batch list of ints)."""

    def __init__(self, scalars, points, challenges: Sequence, batch_shape=()):
        self._scalars = scalars
        self._points = points
        self._challenges = list(challenges)
        self._ci = 0
        self._si = 0
        self._pi = 0
        self.batch_shape = tuple(batch_shape)

    def common_scalar(self, s):
        pass  # hashing already done host-side

    def common_ec_point(self, xy):
        pass

    def squeeze_challenge(self):
        c = self._challenges[self._ci]
        self._ci += 1
        if hasattr(c, "dtype"):  # already a device scalar (jit-traceable arg)
            return c
        if isinstance(c, (list, tuple)):
            return FR_FIELD.from_int(list(c))
        v = FR_FIELD.from_int(c)
        return jnp.broadcast_to(v, self.batch_shape + v.shape)

    def read_scalar(self):
        s = self._scalars[..., self._si, :]
        self._si += 1
        return s

    def read_n_scalars(self, n: int):
        return [self.read_scalar() for _ in range(n)]

    def read_ec_point(self):
        pt = self._points[..., self._pi, :, :]
        self._pi += 1
        return pt

    def read_n_ec_points(self, n: int):
        return [self.read_ec_point() for _ in range(n)]

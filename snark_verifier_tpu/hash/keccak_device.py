"""Device Keccak-256 over uint32 lane pairs — vectorized keccak-f[1600],
vmappable over a proof batch.

The EVM transcript squeezes keccak256 over its 32-byte-word buffer
(/root/reference/snark-verifier/src/system/halo2/transcript/evm.rs:78-105);
host keccak (hash/keccak.py) forced EVM-transcript proofs through a serial
python path.  Here the permutation runs on device: the 25 64-bit lanes are
(lo, hi) uint32 pairs — all theta/rho/pi/chi/iota steps are elementwise
XOR/AND/shift ops on (..., 25, 2) arrays (VPU-friendly; no 64-bit ints
needed, which TPUs don't execute natively), with the 24 rounds driven by one
`lax.scan` over the round constants.

Layout notes:
  * transcript buffers are sequences of 32-byte WORDS, so the sponge blocks
    are lane-aligned except for the dup-hash marker byte (buffer == one
    hash => append 0x01), which lands in a fully STATIC pad lane — padding
    is precomputed host-side per word-count, only word lanes are dynamic.
  * big-endian field-element words map to lanes by a 16-bit-limb reversal +
    per-limb byte swap (see fr_limbs_to_lanes), all static shuffles.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .keccak import _ROUND_CONSTANTS, _ROTATIONS

_U32 = jnp.uint32


def _u(x):
    return jnp.asarray(x, _U32)


# flat lane index: i = x + 5*y (matches the sponge's block order)
@functools.lru_cache(maxsize=None)
def _pi_tables() -> Tuple[np.ndarray, np.ndarray]:
    """dest-indexed (src, rot) tables for the fused rho+pi step:
    b[y + 5*((2x+3y)%5)] = rotl(state[x + 5y], ROT[x][y])."""
    src = np.zeros(25, np.int32)
    rot = np.zeros(25, np.int32)
    for x in range(5):
        for y in range(5):
            dest = y + 5 * ((2 * x + 3 * y) % 5)
            src[dest] = x + 5 * y
            rot[dest] = _ROTATIONS[x][y]
    return src, rot


@functools.lru_cache(maxsize=None)
def _rc_lanes() -> np.ndarray:
    """(24, 2) uint32 round constants as (lo, hi)."""
    out = np.zeros((24, 2), np.uint32)
    for i, rc in enumerate(_ROUND_CONSTANTS):
        out[i, 0] = rc & 0xFFFFFFFF
        out[i, 1] = rc >> 32
    return out


def _rotl64(lanes, rot: np.ndarray):
    """Rotate-left each 64-bit (lo, hi) lane by its static per-lane amount.
    lanes: (..., n, 2); rot: (n,) ints in [0, 64)."""
    s = _u(rot % 32)  # (n,)
    swap = jnp.asarray(rot >= 32)
    lo, hi = lanes[..., 0], lanes[..., 1]
    a = jnp.where(swap, hi, lo)
    b = jnp.where(swap, lo, hi)
    # (x << s) | (y >> (32 - s)); s == 0 must contribute nothing from y
    # (shift-by-32 is undefined for uint32 — mask it out explicitly)
    t = _u(np.where(rot % 32 == 0, 0, 32 - (rot % 32)) % 32)
    carry_mask = _u((rot % 32 != 0).astype(np.uint32) * 0xFFFFFFFF)
    lo2 = (a << s) | ((b >> t) & carry_mask)
    hi2 = (b << s) | ((a >> t) & carry_mask)
    return jnp.stack([lo2, hi2], axis=-1)


def keccak_f(state):
    """One keccak-f[1600] permutation.  state: (..., 25, 2) uint32."""
    src, rot = _pi_tables()
    rcs = jnp.asarray(_rc_lanes())

    def round_body(st, rc):
        # theta
        grid = st.reshape(st.shape[:-2] + (5, 5, 2))  # (..., y, x, 2)
        c = (
            grid[..., 0, :, :]
            ^ grid[..., 1, :, :]
            ^ grid[..., 2, :, :]
            ^ grid[..., 3, :, :]
            ^ grid[..., 4, :, :]
        )  # (..., x, 2)
        d = jnp.bitwise_xor(
            jnp.roll(c, 1, axis=-2), _rotl64(jnp.roll(c, -1, axis=-2), np.ones(5, np.int32))
        )
        st = (grid ^ d[..., None, :, :]).reshape(st.shape)
        # rho + pi (fused static gather + per-lane rotate)
        b = _rotl64(jnp.take(st, jnp.asarray(src), axis=-2), rot)
        # chi: st[x] = b[x] ^ (~b[x+1] & b[x+2]) along the x dim
        bg = b.reshape(b.shape[:-2] + (5, 5, 2))
        st = (bg ^ (~jnp.roll(bg, -1, axis=-2) & jnp.roll(bg, -2, axis=-2))).reshape(
            b.shape
        )
        # iota
        st = st.at[..., 0, :].set(st[..., 0, :] ^ rc)
        return st, None

    out, _ = jax.lax.scan(round_body, state, rcs)
    return out


@functools.lru_cache(maxsize=None)
def _pad_lanes(num_words: int) -> Tuple[np.ndarray, int]:
    """Static sponge padding for a buffer of `num_words` 32-byte words (with
    the transcript's dup-hash 0x01 marker when num_words == 1).  Returns
    (static lanes from index 4*num_words on, shape (L-4w, 2), nblocks)."""
    extra = 1 if num_words == 1 else 0
    n = 32 * num_words + extra
    nblocks = n // 136 + 1
    buf = bytearray(nblocks * 136)
    if extra:
        buf[32] = 0x01  # transcript marker byte (evm.rs:88)
    buf[n] = 0x01  # keccak pad
    buf[-1] |= 0x80
    lanes64 = np.frombuffer(bytes(buf), "<u8")
    static = np.stack(
        [(lanes64 & 0xFFFFFFFF).astype(np.uint32), (lanes64 >> 32).astype(np.uint32)],
        axis=-1,
    )
    return static[4 * num_words :], nblocks


def keccak256_words(words: Sequence, batch_shape=()):
    """keccak256 over a buffer of 32-byte words (the transcript's squeeze,
    including the dup-hash marker byte when the buffer is one word).

    words: list of (..., 4, 2) uint32 lane arrays -> (batch_shape, 4, 2)."""
    W = len(words)
    assert W >= 1
    static, nblocks = _pad_lanes(W)
    dyn = jnp.concatenate(
        [jnp.broadcast_to(w, tuple(batch_shape) + (4, 2)) for w in words], axis=-2
    )
    pad = jnp.broadcast_to(jnp.asarray(static), tuple(batch_shape) + static.shape)
    lanes = jnp.concatenate([dyn, pad], axis=-2)  # (..., nblocks*17, 2)
    state = jnp.zeros(tuple(batch_shape) + (25, 2), _U32)
    for b in range(nblocks):
        block = lanes[..., b * 17 : (b + 1) * 17, :]
        state = state.at[..., :17, :].set(state[..., :17, :] ^ block)
        state = keccak_f(state)
    return state[..., :4, :]


# ------------------------------------------------- field word <-> lane codec


def _bswap16(x):
    return ((x & _u(0xFF)) << _u(8)) | (x >> _u(8))


def limbs_to_lanes(canon):
    """(..., 16) canonical 16-bit limbs (LE) -> (..., 4, 2) lanes of the
    32-byte BIG-endian word the transcript absorbs."""
    rev = _bswap16(canon[..., ::-1])  # (..., 16)
    rr = rev.reshape(rev.shape[:-1] + (4, 4))
    lo = rr[..., 0] | (rr[..., 1] << _u(16))
    hi = rr[..., 2] | (rr[..., 3] << _u(16))
    return jnp.stack([lo, hi], axis=-1)


def lanes_to_limbs(lanes):
    """Inverse of limbs_to_lanes: (..., 4, 2) hash lanes -> (..., 16) LE
    16-bit limbs of the 32-byte value read big-endian."""
    lo, hi = lanes[..., 0], lanes[..., 1]
    rr = jnp.stack(
        [lo & _u(0xFFFF), lo >> _u(16), hi & _u(0xFFFF), hi >> _u(16)], axis=-1
    )  # (..., 4, 4)
    rev = rr.reshape(rr.shape[:-2] + (16,))
    return _bswap16(rev[..., ::-1])


def keccak256_device(data: bytes, batch_shape=()):
    """Whole-byte-string device keccak (testing convenience; the transcript
    path uses keccak256_words).  data length must be a multiple of 32."""
    assert len(data) % 32 == 0 and len(data) > 0
    words = []
    for off in range(0, len(data), 32):
        arr = np.frombuffer(data[off : off + 32], ">u2").astype(np.uint32)[::-1]
        words.append(limbs_to_lanes(jnp.asarray(arr.copy())))
    if len(words) == 1:
        # keccak256_words would apply the transcript's dup-hash marker for
        # single-word buffers; emulate a plain hash by... not supported.
        raise ValueError("single 32-byte block implies the transcript marker")
    return keccak256_words(words, batch_shape)

"""Poseidon permutation + sponge over BN254 Fr (vanilla x^5 spec).

Implements the same hash as the reference's optimized implementation
(/root/reference/snark-verifier/src/util/hash/poseidon.rs): the reference
rearranges constants into sparse-MDS form as a CPU optimization (:247-316);
mathematically both equal the vanilla ARC -> sbox -> MDS round sequence, which
is what a TPU wants anyway (the 65 rounds run as one lax.scan whose body is a
masked full/partial sbox + one batched MDS contraction).  Gate: hadeshash
poseidonperm_x5_254_{3,5} vectors (reference poseidon/tests.rs:35-85).

Sponge semantics mirror the reference exactly (poseidon.rs:449-500):
  * capacity element initialized to 2^64 (variable-input-length tag, :335-342)
  * update() buffers; squeeze() absorbs buffered elements in RATE-chunks at
    state[1..], padding a final short chunk with a single 1; an exact multiple
    (including zero) absorbs one extra all-padding permutation
  * squeeze output is state[1]

Both a pure-Python-int oracle (PoseidonPy) and the vectorized device version
(PoseidonJax, batchable over leading dims) are provided.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import FR, FR_FIELD, NLIMBS
from ..ff.spec import int_to_limbs
from .grain import generate_constants


@functools.lru_cache(maxsize=None)
def get_spec(t: int = 3, r_f: int = 8, r_p: int = 57):
    """(round_constants[(r_f+r_p)][t], mds[t][t], is_full[r_f+r_p]) ints."""
    rcs, mds = generate_constants(FR.p, 254, t, r_f, r_p)
    half = r_f // 2
    is_full = [r < half or r >= half + r_p for r in range(r_f + r_p)]
    return rcs, mds, is_full


# ------------------------------------------------------------------- oracle


class PoseidonPy:
    """Pure-python-int Poseidon sponge (gold model)."""

    def __init__(self, t: int = 3, rate: int = 2, r_f: int = 8, r_p: int = 57):
        self.p = FR.p
        self.t, self.rate, self.r_f, self.r_p = t, rate, r_f, r_p
        self.rcs, self.mds, self.is_full = get_spec(t, r_f, r_p)
        self.state = [1 << 64] + [0] * (t - 1)
        self.buf: List[int] = []

    def clear(self):
        self.state = [1 << 64] + [0] * (self.t - 1)
        self.buf = []

    def permutation(self, inputs: Sequence[int]):
        p, t = self.p, self.t
        s = list(self.state)
        assert len(inputs) < t
        for i, v in enumerate(inputs):
            s[1 + i] = (s[1 + i] + v) % p
        if len(inputs) < self.rate:
            s[1 + len(inputs)] = (s[1 + len(inputs)] + 1) % p
        for r in range(self.r_f + self.r_p):
            s = [(x + c) % p for x, c in zip(s, self.rcs[r])]
            if self.is_full[r]:
                s = [pow(x, 5, p) for x in s]
            else:
                s[0] = pow(s[0], 5, p)
            s = [sum(self.mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]
        self.state = s

    def update(self, elements: Sequence[int]):
        self.buf.extend(int(e) % self.p for e in elements)

    def squeeze(self) -> int:
        # reference poseidon.rs:455-467: absorb all RATE-chunks; an exact
        # multiple (incl. empty) gets one extra all-padding permutation.
        buf, self.buf = self.buf, []
        for i in range(0, len(buf), self.rate):
            self.permutation(buf[i : i + self.rate])
        if len(buf) % self.rate == 0:
            self.permutation([])
        return self.state[1]


# ------------------------------------------------------------------ device


@functools.lru_cache(maxsize=None)
def _device_spec(t: int, r_f: int, r_p: int):
    # pure numpy: safe to cache and to reference from inside any jit trace
    rcs, mds, is_full = get_spec(t, r_f, r_p)
    R = 1 << 256
    rc_mont = np.stack(
        [[int_to_limbs(c * R % FR.p) for c in row] for row in rcs]
    )  # (rounds, t, 16)
    mds_mont = np.stack(
        [[int_to_limbs(m * R % FR.p) for m in row] for row in mds]
    )  # (t, t, 16)
    return rc_mont, mds_mont, np.array(is_full, dtype=np.bool_)


def permute(state, t: int = 3, r_f: int = 8, r_p: int = 57):
    """One permutation of state (..., t, 16) (Fr Montgomery limbs).  Absorption
    is done by the caller (sponge below).  Rounds run as a single lax.scan."""
    F = FR_FIELD
    rc, mds, is_full = _device_spec(t, r_f, r_p)

    def body(s, xs):
        c, full = xs
        s = F.add(s, c)
        x2 = F.square(s)
        s5 = F.mul(s, F.square(x2))
        first = jnp.arange(t) == 0
        take5 = full | first  # partial rounds sbox only element 0
        s = jnp.where(take5[..., None], s5, s)
        # MDS: out_i = Σ_j mds[i,j] * s_j  (one batched mul, tree of adds)
        prod = F.mul(mds, s[..., None, :, :])  # (..., t, t, 16)
        acc = prod[..., 0, :]
        for j in range(1, t):
            acc = F.add(acc, prod[..., j, :])
        return acc, None

    state, _ = jax.lax.scan(body, state, (rc, is_full))
    return state


class PoseidonJax:
    """Device Poseidon sponge, batchable over leading dims.

    `update` takes (..., 16) Fr Montgomery limb arrays (all with a common
    batch shape); chunking happens at trace time so the call pattern must be
    static — exactly like the reference's transcript usage."""

    def __init__(self, t: int = 3, rate: int = 2, r_f: int = 8, r_p: int = 57,
                 batch_shape=()):
        self.t, self.rate, self.r_f, self.r_p = t, rate, r_f, r_p
        self.batch_shape = tuple(batch_shape)
        F = FR_FIELD
        cap = F.from_int(1 << 64)
        zero = jnp.zeros((NLIMBS,), jnp.uint32)
        init = jnp.stack([cap] + [zero] * (t - 1), 0)
        self.state = jnp.broadcast_to(init, self.batch_shape + (t, NLIMBS))
        self.buf: List = []

    def _permute(self, inputs):
        F = FR_FIELD
        s = self.state
        assert len(inputs) < self.t
        for i, v in enumerate(inputs):
            s = s.at[..., 1 + i, :].set(F.add(s[..., 1 + i, :], v))
        if len(inputs) < self.rate:
            one = jnp.broadcast_to(F.one, s[..., 0, :].shape)
            s = s.at[..., 1 + len(inputs), :].set(
                F.add(s[..., 1 + len(inputs), :], one)
            )
        self.state = permute(s, self.t, self.r_f, self.r_p)

    def update(self, elements: Sequence):
        self.buf.extend(elements)

    def update_chunks_scanned(self, chunks):
        """Absorb M FULL rate-chunks via one `lax.scan` — graph size O(1) in
        M, where the buffered path traces one permutation instance per chunk
        (the compile-explosion source for 1024-accumulator folds).

        chunks: (M, ..., rate, 16) Fr Montgomery limbs whose trailing batch
        dims match the sponge's batch shape.  Requires an empty buffer (the
        sponge's chunk boundary must be aligned); sponge semantics equal
        `update(flat elements)` exactly: full chunks never take the
        pad-with-1 rule (poseidon.rs:455-467), and the final all-padding
        permutation still happens in squeeze()."""
        assert not self.buf, "scanned absorb requires an empty sponge buffer"
        assert chunks.shape[-2] == self.rate and self.rate == self.t - 1
        F = FR_FIELD

        def body(st, chunk):
            s = st.at[..., 1 : 1 + self.rate, :].set(
                F.add(st[..., 1 : 1 + self.rate, :], chunk)
            )
            return permute(s, self.t, self.r_f, self.r_p), None

        self.state, _ = jax.lax.scan(body, self.state, chunks)

    def squeeze(self):
        buf, self.buf = self.buf, []
        for i in range(0, len(buf), self.rate):
            self._permute(buf[i : i + self.rate])
        if len(buf) % self.rate == 0:
            self._permute([])
        return self.state[..., 1, :]

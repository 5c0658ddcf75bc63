"""Host-side encode/decode between python-int tower tuples (the oracle
representation in pairing/py_pairing.py) and device limb arrays."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ff.spec import FQ, NLIMBS, int_to_limbs, limbs_to_int

_R = 1 << 256


def _fq_mont(x: int) -> np.ndarray:
    return int_to_limbs((x % FQ.p) * _R % FQ.p)


def _fq_int(limbs) -> int:
    return limbs_to_int(limbs) * pow(_R, -1, FQ.p) % FQ.p


def fq2_from_int(a) -> jnp.ndarray:
    """(c0, c1) int tuple -> (2, 16)."""
    return jnp.asarray(np.stack([_fq_mont(a[0]), _fq_mont(a[1])]))


def fq2_to_int(arr):
    arr = np.asarray(arr)
    return (_fq_int(arr[..., 0, :]), _fq_int(arr[..., 1, :]))


def fq6_from_int(a) -> jnp.ndarray:
    return jnp.stack([fq2_from_int(c) for c in a], 0)


def fq6_to_int(arr):
    arr = np.asarray(arr)
    return tuple(fq2_to_int(arr[i]) for i in range(3))


def fq12_from_int(a) -> jnp.ndarray:
    return jnp.stack([fq6_from_int(c) for c in a], 0)


def fq12_to_int(arr):
    arr = np.asarray(arr)
    return tuple(fq6_to_int(arr[i]) for i in range(2))

"""Prototype: fused RC15-RNS EC add as a Pallas kernel vs plain XLA.

The tree fold's adds run at ~3.3-6.7M/s under XLA (fusion breaks at the 24
dot_generals per add, spilling (B,35) intermediates to HBM); a Pallas kernel
keeps the whole 12-mul chain in VMEM.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snark_verifier_tpu.ec.rns_g1 import G1R, to_rns
from snark_verifier_tpu.ec import from_affine_int, to_affine_int, py_ec

TILE = int(os.environ.get("TILE", "512"))


from snark_verifier_tpu.msm import pallas_ops


def pallas_add(a, b):
    return pallas_ops.add(a, b, tile=TILE)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    print(f"  [{name}: first {time.perf_counter()-t0:.1f}s]")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.1f} ms  {args[0].shape[0]/dt/1e6:8.2f} M adds/s")


def main():
    print(f"devices: {jax.devices()}  TILE={TILE}")
    B = 1 << 19
    pts = py_ec.rand_points(256, seed=1)
    qts = py_ec.rand_points(256, seed=2)
    P = to_rns(jnp.tile(from_affine_int(pts), (B // 256, 1, 1)))
    Q = to_rns(jnp.tile(from_affine_int(qts), (B // 256, 1, 1)))

    # correctness on a small slice
    small = 256
    got = pallas_add(P[:small], Q[:small])
    exp = jax.jit(G1R.add)(P[:small], Q[:small])
    from snark_verifier_tpu.ec.rns_g1 import from_rns

    ok = np.array_equal(np.asarray(from_rns(got)), np.asarray(from_rns(exp)))
    print("pallas add bit-exact:", ok)

    timeit("XLA G1R.add (512k)", jax.jit(G1R.add), P, Q)
    timeit("pallas G1R.add (512k)", pallas_add, P, Q)


if __name__ == "__main__":
    main()

"""Phase-level profiling of the Pippenger MSM at 2^20 on the real chip:
digits+sort+scatter+gather vs tree-fold vs bucket reduction vs horner."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snark_verifier_tpu.ec.rns_g1 import G1R, to_rns
from snark_verifier_tpu.ff.spec import FR, int_to_limbs
from snark_verifier_tpu.msm.pippenger import (
    _bucket_accumulate,
    _tree_fold,
    _weighted_bucket_sum,
    default_capacity,
    extract_digits,
)
from snark_verifier_tpu.utils import native

LOG2N = int(os.environ.get("LOG2N", "20"))
N = 1 << LOG2N
C = 8
CAP = default_capacity(N, 1 << C)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, reps=2):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:10.1f} ms")
    return dt


def main():
    print(f"n=2^{LOG2N} c={C} cap={CAP}")
    rng = np.random.default_rng(0)
    pts = jnp.asarray(native.enumerate_points_dev(N))
    ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(N)]
    scalars = jnp.asarray(np.stack([int_to_limbs(k) for k in ks]))

    t0 = time.perf_counter()
    pts_rns = jax.jit(to_rns)(pts)
    sync(pts_rns)
    print(f"to_rns first: {time.perf_counter()-t0:.1f}s")
    timeit("to_rns (1M points)", jax.jit(to_rns), pts)

    points_ext = jnp.concatenate([pts_rns, G1R.infinity((1,))], axis=0)
    digits = jax.jit(lambda s: extract_digits(s, C))(scalars)
    sync(digits)

    # phase A: sort/scatter/gather only (no EC math): replicate the indexing
    def index_only(points_ext, dw):
        n = dw.shape[0]
        order = jnp.argsort(dw)
        sorted_d = dw[order]
        starts = jnp.searchsorted(sorted_d, jnp.arange(256, dtype=jnp.int32))
        pos = jnp.arange(n, dtype=jnp.int32) - starts[sorted_d]
        tgt = jnp.where(sorted_d == 0, CAP, pos)
        idx = jnp.full((256, CAP), n, dtype=jnp.int32)
        idx = idx.at[sorted_d, tgt].set(order, mode="drop")
        mat = jnp.take(points_ext, idx, axis=0)
        return mat.sum(dtype=jnp.uint32)  # force materialization cheaply

    timeit("index+gather, one window", jax.jit(index_only), points_ext, digits[0])

    # phase B: one full window bucket accumulate (index + tree fold)
    f = jax.jit(lambda pe, d: _bucket_accumulate(G1R, pe, d, 256, CAP))
    timeit("bucket accumulate, one window", f, points_ext, digits[0])

    # phase C: weighted bucket reduction for all 32 windows
    buckets = jnp.tile(pts_rns[: 256 * 32].reshape(32, 256, 3, 35), (1, 1, 1, 1))
    timeit("weighted bucket sum (32w x 256b)", jax.jit(lambda b: _weighted_bucket_sum(G1R, b)), buckets)


def finer():
    print(f"--- finer, n=2^{LOG2N} cap={CAP}")
    rng = np.random.default_rng(0)
    pts = jnp.asarray(native.enumerate_points_dev(N))
    pts_rns = jax.jit(to_rns)(pts)
    sync(pts_rns)
    ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(N)]
    scalars = jnp.asarray(np.stack([int_to_limbs(k) for k in ks]))
    digits = jax.jit(lambda s: extract_digits(s, C))(scalars)
    points_ext = jnp.concatenate([pts_rns, G1R.infinity((1,))], axis=0)

    timeit("argsort 1M", jax.jit(lambda d: jnp.argsort(d).sum()), digits[0])
    order = jnp.argsort(digits[0])
    timeit("take n rows (sorted gather)", jax.jit(lambda pe, o: jnp.take(pe, o, axis=0).astype(jnp.uint32).sum()), points_ext, order)
    idxf = jnp.asarray(np.random.default_rng(1).integers(0, N, (256, CAP)), dtype=jnp.int32)
    timeit("take 256*cap rows (random)", jax.jit(lambda pe, i: jnp.take(pe, i, axis=0).astype(jnp.uint32).sum()), points_ext, idxf)

    # EC add at fold level-0 shape, HBM-resident inputs
    a = jnp.take(points_ext, idxf[:, : CAP // 2].reshape(-1), axis=0)
    b = jnp.take(points_ext, idxf[:, CAP // 2 :].reshape(-1), axis=0)
    sync(a); sync(b)
    timeit("EC add RNS (591k lanes, HBM)", jax.jit(G1R.add), a, b)
    a32, b32 = a.astype(jnp.uint32), b.astype(jnp.uint32)
    # u32-storage variant: monkey-free — adds take u32 in, where() etc fine
    timeit("EC add RNS (591k lanes, u32 in)", jax.jit(G1R.add), a32, b32)


if __name__ == "__main__":
    if os.environ.get("FINER"):
        finer()
    else:
        main()

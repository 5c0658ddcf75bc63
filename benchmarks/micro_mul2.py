"""Flat (scatter-free, scan-free) CIOS prototype vs current scan CIOS.

The scan CIOS is HBM-bound on its carried column state (measured 27M muls/s
== the exact HBM roundtrip time of 33 steps x (B,18) state).  Here columns
are individual (B,) arrays in an unrolled Python loop: a pure elementwise DAG
that XLA can fuse into one kernel, leaving only the (B,16) in/out in HBM.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snark_verifier_tpu.ff import FQ, get_field  # noqa: E402

Fq = get_field(FQ)

B = 1 << 18
REPS = 3
MASK = jnp.uint32(0xFFFF)
NINV = jnp.uint32(FQ.ninv)
P_cols = [jnp.uint32(int(x)) for x in np.asarray(Fq.P)]


def flat_mul_cols(acols, bcols):
    """CIOS over per-column (B,) arrays; returns 16 result columns in [0,2p]."""
    z = jnp.zeros_like(acols[0])
    t = [z] * 18
    for i in range(16):
        ai = acols[i]
        rows = [ai * bcols[j] for j in range(16)]
        t = [
            t[j]
            + (rows[j] & MASK if j < 16 else 0)
            + (rows[j - 1] >> 16 if 1 <= j <= 16 else 0)
            for j in range(18)
        ]
        m = (t[0] * NINV) & MASK
        rows2 = [m * P_cols[j] for j in range(16)]
        t = [
            t[j]
            + (rows2[j] & MASK if j < 16 else 0)
            + (rows2[j - 1] >> 16 if 1 <= j <= 16 else 0)
            for j in range(18)
        ]
        t[1] = t[1] + (t[0] >> 16)
        t = t[1:] + [z]
    # final carry ripple
    out = []
    c = z
    for k in range(16):
        v = t[k] + c
        out.append(v & MASK)
        c = v >> 16
    return out


def flat_mul(a, b):
    acols = [a[..., i] for i in range(16)]
    bcols = [b[..., i] for i in range(16)]
    return jnp.stack(flat_mul_cols(acols, bcols), axis=-1)


def loop(fn, K):
    def run(x, y):
        def body(i, x):
            return fn(x, y)

        return jax.lax.fori_loop(0, K, body, x)

    return jax.jit(run), K


def timeit(name, fnk, *args, work):
    fn, K = fnk

    def sync(o):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0])).ravel()[:1]

    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    print(f"  [{name}: first call {time.perf_counter()-t0:.1f}s]")
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms   {work*K/dt/1e6:12.2f} M/s")


am = Fq.from_int([int(x) for x in np.random.randint(1, 1 << 62, 256)])
am = jnp.tile(am, (B // 256, 1))
bm = Fq.from_int([int(x) for x in np.random.randint(1, 1 << 62, 256)])
bm = jnp.tile(bm, (B // 256, 1))

# correctness
o = jax.jit(flat_mul)(am[:256], bm[:256])
ref = jax.jit(Fq.mul)(am[:256], bm[:256])
assert np.array_equal(
    np.asarray(Fq.canon(o)), np.asarray(Fq.canon(ref))
), "flat mul mismatch"
print("bit-exact vs scan CIOS: OK")

timeit("scan CIOS (current)", loop(Fq.mul, 64), am, bm, work=B)
timeit("flat per-column CIOS", loop(flat_mul, 64), am, bm, work=B)


# chained variant: 4 muls per iteration to amortize in/out HBM
def flat_mul4(a, b):
    x = flat_mul(a, b)
    x = flat_mul(x, b)
    x = flat_mul(x, b)
    x = flat_mul(x, b)
    return x


timeit("flat per-column CIOS x4 chained", loop(flat_mul4, 16), am, bm, work=B * 4)

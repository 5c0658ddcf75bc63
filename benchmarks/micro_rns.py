"""RNS/MXU field core vs positional CIOS core, on the real TPU chip.

Measures field mul and complete EC add throughput for both backends.
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
from snark_verifier_tpu.ff.rns_field import get_rns_field  # noqa: E402
from snark_verifier_tpu.ec import G1, from_affine_int, py_ec  # noqa: E402
from snark_verifier_tpu.ec.rns_g1 import G1R, to_rns  # noqa: E402

F = get_field(FQ)
R = get_rns_field(FQ)
REPS = 3


def timeit(name, fn, args, work, unit="M/s"):
    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    print(f"  [{name}: first call {time.perf_counter()-t0:.1f}s]")
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms   {work/dt/1e6:12.2f} {unit}")


def chain(fn, k):
    def run(x, y):
        def body(i, x):
            return fn(x, y)

        return jax.lax.fori_loop(0, k, body, x)

    return jax.jit(run)


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    B = 1 << 18
    K = 64

    vals = [int.from_bytes(rng.bytes(32)) % FQ.p for _ in range(256)]
    wals = [int.from_bytes(rng.bytes(32)) % FQ.p for _ in range(256)]

    a_pos = jnp.tile(F.from_int(vals), (B // 256, 1))
    b_pos = jnp.tile(F.from_int(wals), (B // 256, 1))
    a_rns = jnp.tile(R.from_int(vals), (B // 256, 1))
    b_rns = jnp.tile(R.from_int(wals), (B // 256, 1))

    timeit("CIOS field mul (scan)", chain(F.mul, K), (a_pos, b_pos), B * K)
    timeit("RNS field mul", chain(R.mul, K), (a_rns, b_rns), B * K)

    # EC adds: chained P <- P + Q
    nb = 1 << 16
    pts = py_ec.rand_points(256, seed=1)
    qts = py_ec.rand_points(256, seed=2)
    P = jnp.tile(from_affine_int(pts), (nb // 256, 1, 1))
    Q = jnp.tile(from_affine_int(qts), (nb // 256, 1, 1))
    Pr, Qr = to_rns(P), to_rns(Q)
    KE = 32
    timeit("EC add positional (RC15)", chain(G1.add, KE), (P, Q), nb * KE)
    timeit("EC add RNS (RC15)", chain(G1R.add, KE), (Pr, Qr), nb * KE)
    timeit("EC double RNS", chain(lambda x, y: G1R.double(x), KE), (Pr, Qr), nb * KE)

    # larger batch for the RNS add (fills the chip better)
    nb2 = 1 << 18
    Pr2 = jnp.tile(Pr, (4, 1, 1))
    Qr2 = jnp.tile(Qr, (4, 1, 1))
    timeit("EC add RNS, batch 256k", chain(G1R.add, KE), (Pr2, Qr2), nb2 * KE)


if __name__ == "__main__":
    main()

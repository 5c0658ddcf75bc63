"""Microbenchmarks for candidate 256-bit modmul formulations on the real chip.

Measures raw primitive throughput to pick the round-2 mul design
(PERFNOTES.md roadmap #1: MXU bignum path).  Each primitive is looped K times
inside one jit (carrying a data dependency) so device time dwarfs the axon
dispatch floor (~10ms).

Run directly on the axon TPU (NOT under tests/conftest.py).
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

dev = jax.devices()[0]
print("device:", dev, getattr(dev, "device_kind", ""))

B = 1 << 18
REPS = 3


def loop(fn, K):
    """Iterate x -> fn(x, y) K times with a data dependency."""

    def run(x, y):
        def body(i, x):
            return fn(x, y)

        return jax.lax.fori_loop(0, K, body, x)

    return jax.jit(run), K


def timeit(name, fnk, *args, work):
    fn, K = fnk
    def sync(o):
        # axon tunnel: block_until_ready returns early; a host readback of one
        # element is the only reliable fence.
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / REPS
    rate = work * K / dt
    print(f"{name:44s} {dt*1e3:9.2f} ms   {rate/1e6:12.2f} M/s")
    return dt


key = jax.random.PRNGKey(0)
a16 = jax.random.randint(key, (B, 16), 0, 1 << 16, dtype=jnp.uint32)
b16 = jax.random.randint(jax.random.PRNGKey(1), (B, 16), 0, 1 << 16, dtype=jnp.uint32)
a8 = jax.random.randint(key, (B, 32), 0, 127, dtype=jnp.int8)
m8 = jax.random.randint(key, (32, 64), 0, 3, dtype=jnp.int8)

# 1. raw elementwise u32 multiply (values < 2^16)
f1 = loop(lambda x, y: (x * y) & jnp.uint32(0xFFFF), 4096)
timeit("u32 elementwise mul (B,16)", f1, a16, b16, work=B * 16)

# 2. u32 outer product + column-ish reduce (product phase shape)
f2 = loop(lambda x, y: ((x[:, :, None] * y[:, None, :]).sum(1)) & jnp.uint32(0xFFFF), 512)
timeit("u32 outer (B,16,16)+sum", f2, a16, b16, work=B * 256)

# 3. int8 constant matmul (B,32)@(32,64) -> int32 (MXU candidate)
f3 = loop(
    lambda x, m: jax.lax.dot_general(
        x, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )[:, :32].astype(jnp.int8),
    8192,
)
timeit("int8 matmul (B,32)@(32,64)", f3, a8, m8, work=B * 32 * 64)

# 4. bf16 constant matmul, (B,16)@(16,32)
fbf = loop(
    lambda x, m: jax.lax.dot_general(
        x, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:, :16].astype(jnp.bfloat16),
    8192,
)
timeit(
    "bf16 matmul (B,16)@(16,32)",
    fbf,
    a16[:, :16].astype(jnp.bfloat16),
    m8[:16, :32].astype(jnp.bfloat16),
    work=B * 16 * 32,
)

# 5. f32 elementwise fma
f5 = loop(lambda x, y: x * y + y, 4096)
timeit(
    "f32 elementwise fma (B,16)",
    f5,
    a16.astype(jnp.float32),
    b16.astype(jnp.float32),
    work=B * 16,
)

from snark_verifier_tpu.ff import FQ, get_field  # noqa: E402

Fq = get_field(FQ)

MASK = jnp.uint32(0xFFFF)
P = Fq.P
NINV = Fq.NINV

am = Fq.from_int([int(x) for x in np.random.randint(1, 1 << 62, 256)])
am = jnp.tile(am, (B // 256, 1))

# 6. current scan-CIOS mul
f6 = loop(Fq.mul, 64)
timeit("LimbField.mul scan-CIOS (current)", f6, am, am, work=B)


# 7. flat CIOS: fully unrolled 16 steps, no scan
def flat_cios(x, y):
    t = jnp.zeros(x.shape[:-1] + (18,), jnp.uint32)
    for i in range(16):
        row = x[..., i : i + 1] * y
        t = t.at[..., :16].add(row & MASK)
        t = t.at[..., 1:17].add(row >> 16)
        m = (t[..., 0] * NINV) & MASK
        row2 = m[..., None] * P
        t = t.at[..., :16].add(row2 & MASK)
        t = t.at[..., 1:17].add(row2 >> 16)
        t = t.at[..., 1].add(t[..., 0] >> 16)
        t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)
    limbs = []
    c = jnp.zeros(t.shape[:-1], jnp.uint32)
    for k in range(16):
        v = t[..., k] + c
        limbs.append(v & MASK)
        c = v >> 16
    return jnp.stack(limbs, axis=-1)


f7 = jax.jit(flat_cios)
o = f7(am, am)
ref = jax.jit(Fq.mul)(am, am)
assert np.array_equal(
    np.asarray(Fq.canon(o[:64])), np.asarray(Fq.canon(ref[:64]))
), "flat CIOS mismatch"
f7l = loop(flat_cios, 64)
timeit("flat CIOS unrolled (no scan)", f7l, am, am, work=B)

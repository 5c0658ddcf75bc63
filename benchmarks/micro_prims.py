"""Primitive-rate microbench on the real TPU chip.

Measures the raw rates that decide the bignum-multiply formulation:
  - u32 elementwise multiply (current CIOS building block)
  - f32 elementwise multiply/add (candidate float-RNS building block)
  - f32 fused a*b+c chains (FMA detection)
  - u8 dot_general -> s32 (MXU int path, candidate for base extension /
    Montgomery reduction matmuls)
  - bf16 matmul -> f32 (MXU float path)
  - prototype 16-bit pseudo-Mersenne modmul (integer RNS elementwise op)
  - prototype f32 modmul via split exact products (float RNS elementwise op)

Every loop iteration feeds the next so nothing folds away.  Work sized so a
rep is >100ms (the axon tunnel's reliable floor is ~10ms).
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

REPS = 3


def timeit(name, fn, args, work, unit="Gop/s"):
    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:46s} {dt*1e3:9.2f} ms   {work/dt/1e9:10.2f} {unit}")
    return work / dt


# ---------------------------------------------------------------- elementwise

B = 1 << 22  # 4M lanes
K = 1024


def chain_u32(x, y):
    def body(i, x):
        return (x * y + x) & jnp.uint32(0xFFFFFFFF)

    return jax.lax.fori_loop(0, K, body, x)


def chain_f32(x, y):
    def body(i, x):
        return x * y + x

    return jax.lax.fori_loop(0, K, body, x)


def chain_f32_mul(x, y):
    def body(i, x):
        return x * y

    return jax.lax.fori_loop(0, K, body, x)


# 16-bit pseudo-Mersenne modmul: m = 2^16 - c, values < 2^16 held in u32.
# t = x*y < 2^32; t mod m via two folds: t = hi*2^16+lo == hi*c+lo (mod m).
def chain_modmul_u16(x, y, c):
    def body(i, x):
        t = x * y
        t = (t >> 16) * c + (t & jnp.uint32(0xFFFF))  # < 2^24ish
        t = (t >> 16) * c + (t & jnp.uint32(0xFFFF))  # < 2^17
        return t

    return jax.lax.fori_loop(0, K, body, x)


# f32 modmul prototype, m ~ 2^20: exact product via 10-bit split, approximate
# quotient, remainder in f32.  (Correctness not the point here — op mix is.)
def chain_modmul_f32(x, y, m, inv_m):
    SPLIT = jnp.float32(1 << 10)

    def body(i, x):
        xh = jnp.floor(x / SPLIT)
        xl = x - xh * SPLIT
        yh = jnp.floor(y / SPLIT)
        yl = y - yh * SPLIT
        hh = xh * yh  # each product exact in f32
        hl = xh * yl + xl * yh
        ll = xl * yl
        # reduce hh*2^20 mod m first (hh < 2^20): fold via precomputed 2^20 mod m
        q = jnp.floor((hh * SPLIT * SPLIT + hl * SPLIT + ll) * inv_m)
        r = hh * SPLIT * SPLIT + hl * SPLIT + ll - q * m
        return jnp.where(r < 0, r + m, jnp.where(r >= m, r - m, r))

    return jax.lax.fori_loop(0, K, body, x)


# -------------------------------------------------------------------- matmuls


def matmul_loop(a, b, n_iter, prec=None):
    def body(i, a):
        o = jax.lax.dot_general(
            a,
            b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if a.dtype in (jnp.int8, jnp.uint8) else jnp.float32,
        )
        return o.astype(a.dtype)

    return jax.lax.fori_loop(0, n_iter, body, a)


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    xu = jnp.asarray(rng.integers(1, 1 << 16, B, dtype=np.uint32))
    yu = jnp.asarray(rng.integers(1, 1 << 16, B, dtype=np.uint32))
    xf = jnp.asarray(rng.integers(1, 1 << 20, B).astype(np.float32))
    yf = jnp.asarray(rng.integers(1, 1 << 20, B).astype(np.float32))

    timeit("u32 mul+add chain", jax.jit(chain_u32), (xu, yu), B * K)
    timeit("f32 mul+add chain (fma?)", jax.jit(chain_f32), (xf * 0 + 1.0001, yf * 0 + 1.0), B * K)
    timeit("f32 mul chain", jax.jit(chain_f32_mul), (xf * 0 + 1.0001, yf * 0 + 1.0), B * K)
    timeit(
        "u16 pseudo-mersenne modmul chain",
        jax.jit(chain_modmul_u16),
        (xu & jnp.uint32(0xFFFF), yu & jnp.uint32(0xFFFF), jnp.uint32(17)),
        B * K,
        unit="G modmul/s",
    )
    m = float((1 << 20) - 3)
    timeit(
        "f32 modmul chain (split products)",
        jax.jit(chain_modmul_f32),
        (xf % m, yf % m, jnp.float32(m), jnp.float32(1.0 / m)),
        B * K,
        unit="G modmul/s",
    )

    # MXU: square matmuls, chained
    for n, dt, iters in [
        (1024, jnp.int8, 4096),
        (1024, jnp.uint8, 4096),
        (2048, jnp.int8, 1024),
        (1024, jnp.bfloat16, 4096),
        (2048, jnp.bfloat16, 1024),
    ]:
        a = jnp.asarray(rng.integers(0, 4, (n, n)), dtype=dt)
        b = jnp.asarray(rng.integers(0, 4, (n, n)), dtype=dt)
        flops = 2 * n * n * n * iters
        try:
            timeit(
                f"matmul {n}x{n} {np.dtype(dt).name} x{iters}",
                jax.jit(lambda a, b, ni=iters: matmul_loop(a, b, ni)),
                (a, b),
                flops,
                unit="GMAC*2/s",
            )
        except Exception as e:
            print(f"matmul {n} {np.dtype(dt).name}: FAILED {type(e).__name__}: {e}")

    # Batched tiny matmul (the naive Toeplitz-conv shape): (B,1,32)@(B,32,63)
    Bb = 1 << 16
    a = jnp.asarray(rng.integers(0, 100, (Bb, 1, 32)), dtype=jnp.int8)
    bt = jnp.asarray(rng.integers(0, 100, (Bb, 32, 63)), dtype=jnp.int8)

    def batched_mm(a, bt):
        def body(i, a):
            o = jax.lax.dot_general(
                a, bt, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
            )
            return (o[..., :32]).astype(jnp.int8)

        return jax.lax.fori_loop(0, 256, body, a)

    timeit(
        "batched (B,1,32)@(B,32,63) int8 x16",
        jax.jit(batched_mm),
        (a, bt),
        Bb * 32 * 63 * 256,
        unit="GMAC/s",
    )

    # Shared-rhs matmul at bignum-reduction shape: (B,32)@(32,64) u8->s32
    Bb = 1 << 18
    a = jnp.asarray(rng.integers(0, 128, (Bb, 32)), dtype=jnp.int8)
    w = jnp.asarray(rng.integers(0, 128, (32, 64)), dtype=jnp.int8)

    def shared_mm(a, w):
        def body(i, a):
            o = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return o[:, :32].astype(jnp.int8)

        return jax.lax.fori_loop(0, 1024, body, a)

    timeit(
        "shared (256k,32)@(32,64) int8 x64",
        jax.jit(shared_mm),
        (a, w),
        Bb * 32 * 64 * 1024,
        unit="GMAC/s",
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.md north star): MSM points/sec/chip at 2^20 on BN254 G1.
The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against the analytic north-star placeholder 1.0 until a measured reference
CPU number exists.

Points are generated on-device as [i+1]·G via a log-depth doubling ladder, so
the result is self-checkable: Σ sᵢ·[i+1]G == [Σ sᵢ·(i+1) mod r]·G.

Env knobs: BENCH_LOG2N (default 20), BENCH_REPS (default 3).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def gen_points(n):
    """[1..n]·G: native C++ enumeration when available (seconds), else an
    on-device log-depth doubling ladder."""
    from snark_verifier_tpu.ec import G1, generator, py_ec, from_affine_int
    from snark_verifier_tpu.utils import native

    if native.available():
        return jnp.asarray(native.enumerate_points_dev(n))

    levels = int(np.log2(n))
    assert 1 << levels == n, "n must be a power of two"

    # host-precomputed offsets [2^k]G (cheap python ints)
    offs = []
    pt = py_ec.G1_GEN
    for _ in range(levels):
        offs.append(pt)
        pt = py_ec.double(pt)
    offs_dev = from_affine_int(offs)

    @jax.jit
    def build(offs_dev):
        arr = generator()[None]
        for k in range(levels):
            arr = jnp.concatenate([arr, G1.add(arr, offs_dev[k][None])], 0)
        return arr

    return build(offs_dev)


def bench_verify():
    """BENCH_MODE=verify: proofs verified/sec at batch BENCH_BATCH.
    BENCH_K (default 10) sets the circuit size — the verify graph itself is
    k-independent (commitment count, not domain size, drives the work), but
    k >= 10 keeps the proof shapes honest vs the reference's workloads."""
    B = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    k = int(os.environ.get("BENCH_K", "10"))
    import jax
    import numpy as np_

    from snark_verifier_tpu.parallel import batch_verify_sharded
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.system.standard_plonk import (
        StandardPlonk,
        build_protocol,
        gen_snark,
    )

    srs = toy_srs(max(32, 2 << k))
    circuit = StandardPlonk.rand(k=k, seed=1)
    protocol = build_protocol(circuit, srs)
    t0 = time.time()
    snark = gen_snark(circuit, protocol, srs, scheme="shplonk")
    print(f"# host prove: {time.time()-t0:.1f}s", file=sys.stderr)
    snarks = [snark] * B
    # jitted whole-pipeline path (1-device mesh == plain batched verify)
    mesh = jax.sharding.Mesh(np_.array(jax.devices()[:1]), ("batch",))

    def sync(x):
        np_.asarray(jax.device_get(x.ravel()[:1]))

    from snark_verifier_tpu.utils.timing import METER

    t0 = time.time()
    METER.start("verify_trace")
    oks = batch_verify_sharded(snarks, srs, mesh, "shplonk")
    METER.end("verify_trace")
    sync(oks)
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)
    print(f"# cost-meter: {METER.report()}", file=sys.stderr)
    ok = bool(np_.asarray(oks).all())

    times = []
    for _ in range(reps):
        t0 = time.time()
        sync(batch_verify_sharded(snarks, srs, mesh, "shplonk"))
        times.append(time.time() - t0)
    dt = min(times)
    print(
        json.dumps(
            {
                "metric": "plonk_proofs_verified_per_sec_batch%d" % B
                + ("" if ok else "_INCORRECT"),
                "value": round(B / dt, 2),
                "unit": "proofs/s",
                "vs_baseline": 1.0,
            }
        )
    )


def bench_pairing():
    """BENCH_MODE=pairing: KZG-decider pairing checks/sec at batch
    BENCH_BATCH (the reference's decide loop, pcs/kzg/decider.rs:70-80,
    as one vmapped multi-Miller-loop + final exp)."""
    B = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    import jax

    from snark_verifier_tpu.ec import from_affine_int, py_ec
    from snark_verifier_tpu.pcs.kzg.decider import decide
    from snark_verifier_tpu.sdk.srs import toy_srs

    import random

    from snark_verifier_tpu.ff.spec import FR

    srs = toy_srs(8, seed=0xA11CE)
    tau = random.Random(0xA11CE).randrange(1, FR.p)
    # valid accumulators: lhs = tau * rhs  =>  e(lhs, g2) e(rhs, -tau g2) == 1
    rng = np.random.default_rng(3)
    ks = [int.from_bytes(rng.bytes(31)) for _ in range(B)]
    rhs = from_affine_int([py_ec.scalar_mul(py_ec.G1_GEN, k) for k in ks])
    lhs = from_affine_int(
        [py_ec.scalar_mul(py_ec.G1_GEN, k * tau % FR.p) for k in ks]
    )
    fn = jax.jit(lambda l, r: decide(srs, l, r))

    def sync(x):
        np.asarray(jax.device_get(x.ravel()[:1]))

    t0 = time.time()
    ok = fn(lhs, rhs)
    sync(ok)
    print(f"# pairing compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    all_ok = bool(np.asarray(ok).all())
    times = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(lhs, rhs))
        times.append(time.time() - t0)
    dt = min(times)
    print(
        json.dumps(
            {
                "metric": "pairing_checks_per_sec_batch%d" % B
                + ("" if all_ok else "_INCORRECT"),
                "value": round(B / dt, 2),
                "unit": "pairings/s",
                "vs_baseline": 1.0,
            }
        )
    )


def measure_cpu_baseline(log2n: int = 17):
    """Self-measured CPU reference rate: the multithreaded C++ Pippenger
    (csrc/bn254.cpp bn254_msm_mt — the reference's rayon MSM shape,
    util/msm.rs:290-310) on this host, all cores.  Returns points/s or None.
    Measured at 2^17 (Pippenger points/s is ~size-independent for fixed c:
    doubling overhead amortizes below the few-percent level by 2^17), with a
    generator-multiple self-check so the number can't silently be garbage."""
    from snark_verifier_tpu.ec import py_ec
    from snark_verifier_tpu.ff.spec import FR
    from snark_verifier_tpu.utils import native

    if not native.available():
        return None
    n = 1 << log2n
    raw = native.enumerate_points_raw(n)
    rng = np.random.default_rng(7)
    ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(n)]
    scs = np.concatenate([native._limbs64(k) for k in ks])
    t0 = time.time()
    out = native.msm_mt_dev(raw, scs)
    dt = time.time() - t0
    k_total = sum(s * (i + 1) for i, s in enumerate(ks)) % FR.p
    assert native._dec_point(out) == py_ec.scalar_mul(py_ec.G1_GEN, k_total), (
        "CPU baseline self-check failed"
    )
    rate = n / dt
    print(f"# cpu baseline (msm_mt, {os.cpu_count()} threads, 2^{log2n}): "
          f"{rate:.0f} points/s ({dt:.1f}s)", file=sys.stderr)
    return rate


def main():
    if os.environ.get("BENCH_MODE") == "verify":
        bench_verify()
        return
    if os.environ.get("BENCH_MODE") == "pairing":
        bench_pairing()
        return
    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n

    from snark_verifier_tpu.ec import G1, generator, to_affine_int, py_ec
    from snark_verifier_tpu.ff.spec import FR, int_to_limbs
    from snark_verifier_tpu.msm import msm, msm_rns

    backend = os.environ.get("BENCH_BACKEND", "rns")
    c_bits = int(os.environ.get("BENCH_C", "8"))
    kernel = msm_rns if backend == "rns" else msm

    t0 = time.time()
    points = gen_points(n)
    points.block_until_ready()
    print(f"# point gen: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(42)
    ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for i in range(n)]
    scalars = jnp.asarray(np.stack([int_to_limbs(k) for k in ks]))

    def _sync(x):
        # block_until_ready returns early through the axon tunnel; a
        # device_get of one element is the only reliable barrier.
        np.asarray(jax.device_get(x.ravel()[:1]))

    import jax

    t0 = time.time()
    out, ovf = kernel(points, scalars, c=c_bits)
    _sync(out)
    print(f"# msm compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.time()
        out, ovf = kernel(points, scalars, c=c_bits)
        _sync(out)
        times.append(time.time() - t0)
    dt = min(times)

    # self-check: expected scalar on the generator
    k_total = sum(s * (i + 1) for i, s in enumerate(ks)) % FR.p
    want = py_ec.scalar_mul(py_ec.G1_GEN, k_total)
    got = to_affine_int(out)
    ok = (got == want) and not bool(ovf)
    print(f"# correct={ok} overflow={bool(ovf)} best={dt:.3f}s", file=sys.stderr)

    cpu_rate = measure_cpu_baseline()
    value = round(n / dt, 1)
    print(
        json.dumps(
            {
                "metric": f"msm_points_per_sec_2^{log2n}_bn254_g1"
                + ("" if ok else "_INCORRECT"),
                "value": value,
                "unit": "points/s",
                "vs_baseline": (
                    round(value / cpu_rate, 3) if cpu_rate else 1.0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

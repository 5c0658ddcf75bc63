"""Benchmark harness: prints ONE JSON line carrying the three north-star
metrics (BASELINE.md):

  * msm_points_per_sec_2^20_bn254_g1      (primary metric/value fields)
  * verify proofs/s at batch 1024 on the HONEST workload: distinct
    vanilla-PLONK snarks (permutation + lookup + user challenge, k=10,
    committed fixtures under benchmarks/fixtures/)
  * pairing checks/s at batch 256

vs_baseline is measured, not assumed: the MSM ratio is against the native
C++ multithreaded Pippenger on this host (the reference's rayon MSM shape);
the verify ratio is against the python native-loader verifier (the
reference's NativeLoader execution model) on this host.

Env knobs: BENCH_MODE=all|msm|verify|pairing|tree, BENCH_LOG2N, BENCH_REPS,
BENCH_BATCH, BENCH_TRANSCRIPT=poseidon|evm, BENCH_SCHEME=shplonk|gwc,
BENCH_BUDGET (seconds; remaining phases are skipped — and reported as
null — once exceeded).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: TPU backends only.  On XLA:CPU cache writes were
# root-caused as a segfault source (PERFNOTES round 3 / tests/conftest.py) —
# never enable it there.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.abspath(__file__))


def _sync(x):
    # block_until_ready returns early through the axon tunnel; a device_get
    # of one element is the only reliable barrier.
    np.asarray(jax.device_get(x.ravel()[:1]))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def gen_points(n):
    """[1..n]·G: native C++ enumeration when available (seconds), else an
    on-device log-depth doubling ladder."""
    from snark_verifier_tpu.ec import G1, generator, py_ec, from_affine_int
    from snark_verifier_tpu.utils import native

    if native.available():
        return jnp.asarray(native.enumerate_points_dev(n))

    levels = int(np.log2(n))
    assert 1 << levels == n, "n must be a power of two"
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


def measure_cpu_baseline(log2n: int = 17):
    """Self-measured CPU reference rate: the multithreaded C++ Pippenger
    (csrc/bn254.cpp bn254_msm_mt — the reference's rayon MSM shape,
    util/msm.rs:290-310) on this host, all cores.  Returns points/s or None.
    Measured at 2^17 (Pippenger points/s is ~size-independent for fixed c),
    with a generator-multiple self-check."""
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
    dt = None
    for _ in range(3):  # best-of-3: host load skews single runs badly
        t0 = time.time()
        out = native.msm_mt_dev(raw, scs)
        d = time.time() - t0
        dt = d if dt is None or d < dt else dt
    k_total = sum(s * (i + 1) for i, s in enumerate(ks)) % FR.p
    assert native._dec_point(out) == py_ec.scalar_mul(py_ec.G1_GEN, k_total), (
        "CPU baseline self-check failed"
    )
    rate = n / dt
    log(f"cpu baseline (msm_mt, {os.cpu_count()} threads, 2^{log2n}): "
        f"{rate:.0f} points/s ({dt:.1f}s)")
    return rate


def bench_msm():
    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n

    from snark_verifier_tpu.ec import to_affine_int, py_ec
    from snark_verifier_tpu.ff.spec import FR, int_to_limbs
    from snark_verifier_tpu.msm import msm, msm_rns

    backend = os.environ.get("BENCH_BACKEND", "rns")
    c_bits = int(os.environ.get("BENCH_C", "8"))
    kernel = msm_rns if backend == "rns" else msm

    t0 = time.time()
    points = gen_points(n)
    points.block_until_ready()
    log(f"point gen: {time.time()-t0:.1f}s")

    rng = np.random.default_rng(42)
    ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for i in range(n)]
    scalars = jnp.asarray(np.stack([int_to_limbs(k) for k in ks]))

    t0 = time.time()
    out, ovf = kernel(points, scalars, c=c_bits)
    _sync(out)
    compile_s = time.time() - t0
    log(f"msm compile+first run: {compile_s:.1f}s")

    times = []
    for _ in range(reps):
        t0 = time.time()
        out, ovf = kernel(points, scalars, c=c_bits)
        _sync(out)
        times.append(time.time() - t0)
    dt = min(times)

    k_total = sum(s * (i + 1) for i, s in enumerate(ks)) % FR.p
    want = py_ec.scalar_mul(py_ec.G1_GEN, k_total)
    ok = (to_affine_int(out) == want) and not bool(ovf)
    log(f"msm correct={ok} overflow={bool(ovf)} best={dt:.3f}s")

    cpu_rate = measure_cpu_baseline()
    return {
        "msm_log2n": log2n,
        "msm_points_per_sec": round(n / dt, 1),
        "msm_correct": ok,
        "msm_compile_s": round(compile_s, 1),
        "msm_cpu_baseline_points_per_sec": round(cpu_rate, 1) if cpu_rate else None,
    }


def _load_fixture_snarks(prefix: str = "snark_"):
    from snark_verifier_tpu.sdk.snark import Snark
    from snark_verifier_tpu.sdk.srs import load_params

    d = os.path.join(REPO, "benchmarks", "fixtures", "vanilla_k10")
    if not os.path.isdir(d):
        return None, None
    srs = load_params(os.path.join(d, "srs.bin"))
    snarks = []
    for name in sorted(os.listdir(d)):
        if name.startswith(prefix):
            snarks.append(Snark.load(os.path.join(d, name)))
    return srs, snarks


def bench_verify():
    """Proofs/s at batch BENCH_BATCH on distinct full-equation vanilla-PLONK
    snarks (k=10; permutation + lookup + user challenge).  The 16 committed
    fixture snarks are tiled to fill the batch — verification work is
    per-element identical either way; distinctness guards against any
    accidental batch-level dedup."""
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # BENCH_TRANSCRIPT=evm runs the keccak (on-chain) proof family through
    # the same batched device path via the device keccak-f[1600] transcript
    transcript = os.environ.get("BENCH_TRANSCRIPT", "poseidon")
    # BENCH_SCHEME=gwc measures the GWC19 multiopen family on device (needs
    # the gwcsnark_ fixtures: benchmarks/gen_fixtures.py 10 16 gwc)
    scheme = os.environ.get("BENCH_SCHEME", "shplonk")
    from snark_verifier_tpu.parallel import batch_verify_sharded
    from snark_verifier_tpu.verifier.plonk.verifier import verify_snark_native

    prefix = ("gwcsnark_" if scheme == "gwc"
              else "evmsnark_" if transcript == "evm" else "snark_")
    srs, base = _load_fixture_snarks(prefix)
    if not base:
        log(f"verify: no {prefix} fixtures found, skipping")
        return {}
    snarks = [base[i % len(base)] for i in range(B)]
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("batch",))

    timings = {}
    t0 = time.time()
    oks = batch_verify_sharded(snarks, srs, mesh, scheme, timings=timings,
                               transcript=transcript)
    _sync(oks)
    compile_s = time.time() - t0
    log(f"verify compile+first run: {compile_s:.1f}s {timings}")
    ok = bool(np.asarray(oks).all())

    times = []
    for _ in range(reps):
        t0 = time.time()
        _sync(batch_verify_sharded(snarks, srs, mesh, scheme,
                                   transcript=transcript))
        times.append(time.time() - t0)
    dt = min(times)

    # negative control: one tampered instance must flip exactly its lane
    # (same batch size B so the compiled executable is reused)
    from snark_verifier_tpu.ff.spec import FR as _FR
    from snark_verifier_tpu.sdk.snark import Snark as _S

    tam = _S(snarks[0].protocol, [list(snarks[0].instances[0])],
             snarks[0].scalars, snarks[0].points)
    tam.instances[0][0] = (tam.instances[0][0] + 1) % _FR.p
    neg = np.asarray(batch_verify_sharded([tam] + snarks[1:], srs, mesh,
                                          scheme, transcript=transcript))
    neg_ok = (not bool(neg[0])) and bool(neg[1:].all())
    log(f"verify correct={ok} negative_control={neg_ok} best={dt:.3f}s")

    # CPU reference rate: the python native-loader verifier (reference
    # NativeLoader execution model), same snark
    t0 = time.time()
    n_native = 2
    for i in range(n_native):
        assert verify_snark_native(base[i], srs, scheme,
                                   transcript=transcript)
    native_rate = n_native / (time.time() - t0)
    log(f"native-loader verify: {native_rate:.2f} proofs/s")

    # warm-start-at-point-of-use: a FRESH process re-running this exact
    # pipeline must pay seconds (AOT executable cache, sdk/aot.py), not the
    # minutes-long cold compile; measured in-run so the driver records it
    warm_s = None
    from snark_verifier_tpu.sdk import aot as _aot

    if _aot.enabled():
        import subprocess as _sp

        code = (
            "import os,sys,time\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "import jax, numpy as np\n"
            "t0=time.time()\n"
            "from snark_verifier_tpu.parallel import batch_verify_sharded\n"
            "from snark_verifier_tpu.sdk.snark import Snark\n"
            "from snark_verifier_tpu.sdk.srs import load_params\n"
            f"d=os.path.join({REPO!r},'benchmarks','fixtures','vanilla_k10')\n"
            "srs=load_params(os.path.join(d,'srs.bin'))\n"
            f"base=[Snark.load(os.path.join(d,n)) for n in sorted(os.listdir(d)) if n.startswith({prefix!r})]\n"
            f"snarks=[base[i%len(base)] for i in range({B})]\n"
            "mesh=jax.sharding.Mesh(np.array(jax.devices()[:1]),('batch',))\n"
            f"oks=batch_verify_sharded(snarks,srs,mesh,{scheme!r},transcript={transcript!r})\n"
            "assert bool(np.asarray(jax.device_get(oks)).all())\n"
            "print('WARM_START_S=%.1f'%(time.time()-t0))\n"
        )
        t0 = time.time()
        try:
            out = _sp.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=600)
            for ln in out.stdout.splitlines():
                if ln.startswith("WARM_START_S="):
                    warm_s = float(ln.split("=")[1])
            if warm_s is None:
                log(f"warm-start probe failed: {out.stderr[-300:]}")
        except Exception as e:
            log(f"warm-start probe error: {e}")
        log(f"verify warm start (fresh process): {warm_s}s")

    return {
        "verify_batch": B,
        "verify_proofs_per_sec": round(B / dt, 2),
        "verify_correct": ok and neg_ok,
        "verify_compile_s": round(compile_s, 1),
        "verify_native_baseline_proofs_per_sec": round(native_rate, 2),
        "verify_warm_start_s": warm_s,
        "verify_workload": (
            f"vanilla_plonk_k10_perm_lookup_challenge_{scheme}"
            + ("_keccak" if transcript == "evm" else "")
        ),
    }


def bench_tree():
    """BASELINE config #5 at single-chip scale: 1024-leaf two-layer
    recursive fold (per-shard succinct-verify + KzgAs fold -> all_gather ->
    root fold -> ONE pairing), leaves/s.  Correctness gates: the valid batch
    root-decides true AND a batch with one tampered leaf root-decides false
    (same shapes — the compiled executable is reused)."""
    B = int(os.environ.get("BENCH_BATCH_TREE", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    from snark_verifier_tpu.parallel.comm_model import (
        collective_inventory_from_text,
        predict_efficiency,
    )
    from snark_verifier_tpu.sdk.snark import Snark
    from snark_verifier_tpu.sdk.tree_aggregation import tree_aggregate_sharded

    srs, base = _load_fixture_snarks()
    if not base:
        log("tree: no fixtures found, skipping")
        return {}
    snarks = [base[i % len(base)] for i in range(B)]
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("batch",))

    t0 = time.time()
    _, _, ok = tree_aggregate_sharded(snarks, srs, mesh, "shplonk")
    _sync(ok)
    compile_s = time.time() - t0
    log(f"tree compile+first run: {compile_s:.1f}s")
    root_ok = bool(np.asarray(ok))

    times = []
    for _ in range(reps):
        t0 = time.time()
        _, _, ok = tree_aggregate_sharded(snarks, srs, mesh, "shplonk")
        _sync(ok)
        times.append(time.time() - t0)
    dt = min(times)

    from snark_verifier_tpu.ff.spec import FR as _FR

    tam = Snark(snarks[0].protocol, [list(snarks[0].instances[0])],
                snarks[0].scalars, snarks[0].points)
    tam.instances[0][0] = (tam.instances[0][0] + 1) % _FR.p
    _, _, bad_ok = tree_aggregate_sharded([tam] + snarks[1:], srs, mesh,
                                          "shplonk")
    neg_ok = not bool(np.asarray(bad_ok))
    log(f"tree correct={root_ok} negative_control={neg_ok} best={dt:.3f}s")

    # scaling-efficiency evidence: predicted weak-scaling efficiency of the
    # mesh layers at this per-device load (SCALING.md model; the collective
    # volumes the model assumes are asserted by the dryrun artifact).
    eff8 = predict_efficiency(B, 8, chip_points_per_sec=B / dt,
                              coll_bytes_per_device=2 * 193)
    return {
        "tree_leaves": B,
        "tree_leaves_per_sec": round(B / dt, 2),
        "tree_correct": root_ok and neg_ok,
        "tree_compile_s": round(compile_s, 1),
        "tree_pred_weak_scaling_eff_8dev": round(eff8["efficiency"], 6),
    }


def bench_pairing():
    B = int(os.environ.get("BENCH_BATCH_PAIRING", "256"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    import random

    from snark_verifier_tpu.ec import from_affine_int, py_ec
    from snark_verifier_tpu.ff.spec import FR
    from snark_verifier_tpu.pcs.kzg.decider import decide
    from snark_verifier_tpu.sdk.srs import toy_srs

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

    t0 = time.time()
    ok = fn(lhs, rhs)
    _sync(ok)
    compile_s = time.time() - t0
    log(f"pairing compile+first: {compile_s:.1f}s")
    all_ok = bool(np.asarray(ok).all())
    times = []
    for _ in range(reps):
        t0 = time.time()
        _sync(fn(lhs, rhs))
        times.append(time.time() - t0)
    dt = min(times)
    log(f"pairing correct={all_ok} best={dt:.3f}s")
    return {
        "pairing_batch": B,
        "pairing_checks_per_sec": round(B / dt, 2),
        "pairing_correct": all_ok,
        "pairing_compile_s": round(compile_s, 1),
    }


def main():
    mode = os.environ.get("BENCH_MODE", "all")
    budget = float(os.environ.get("BENCH_BUDGET", "3000"))
    start = time.time()
    r = {}
    phases = {
        "msm": bench_msm,
        "verify": bench_verify,
        "pairing": bench_pairing,
        "tree": bench_tree,
    }
    def emit(r):
        """Print the JSON line with everything measured SO FAR — emitted
        after every phase so a mid-phase kill (driver timeout) still leaves
        a parseable last line with the completed phases."""
        msm_rate = r.get("msm_points_per_sec")
        cpu = r.get("msm_cpu_baseline_points_per_sec")
        # only brand the primary metric INCORRECT if the msm phase actually
        # ran and failed its gate (single-phase runs skip it legitimately)
        primary_ok = r.get("msm_correct", "msm" not in order)
        line = {
            "metric": "msm_points_per_sec_2^%s_bn254_g1" % r.get("msm_log2n", 20)
            + ("" if primary_ok else "_INCORRECT"),
            "value": msm_rate if msm_rate is not None else 0.0,
            "unit": "points/s",
            "vs_baseline": (
                round(msm_rate / cpu, 3) if (msm_rate and cpu) else 1.0
            ),
            "extra": {
                k: v
                for k, v in r.items()
                if not k.startswith("msm_") or k in ("msm_compile_s",)
            },
        }
        print(json.dumps(line), flush=True)

    order = [mode] if mode in phases else ["msm", "verify", "pairing", "tree"]
    for name in order:
        if time.time() - start > budget and r:
            log(f"budget {budget}s exceeded, skipping {name}")
            r[f"{name}_skipped"] = "budget"
            continue
        try:
            r.update(phases[name]())
        except Exception as e:  # a phase failure must not eat the others
            log(f"{name} phase FAILED: {type(e).__name__}: {e}")
            r[f"{name}_error"] = f"{type(e).__name__}: {e}"
        emit(r)


if __name__ == "__main__":
    main()

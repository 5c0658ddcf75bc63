"""Aggregation driver: N proofs -> batched verify -> accumulator fold -> ONE
pairing check.

The TPU-native counterpart of the reference's aggregation example
(/root/reference/snark-verifier/examples/evm-verifier-with-accumulator.rs and
snark-verifier-sdk/benches/standard_plonk.rs: 3 StandardPlonk snarks folded
through AggregationCircuit) — here the fold is a batched device computation
(BASELINE configs #3/#4 shape).

Usage: python examples/aggregate_proofs.py [--n 4] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from snark_verifier_tpu.ff.spec import FR
    from snark_verifier_tpu.pcs.kzg.decider import decide
    from snark_verifier_tpu.sdk.aggregation import aggregate, batch_verify
    from snark_verifier_tpu.sdk.snark import Snark
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.system.standard_plonk import (
        StandardPlonk,
        build_protocol,
        gen_snark,
    )

    print(f"backend={jax.default_backend()} n={args.n}")
    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=7)
    protocol = build_protocol(circuit, srs)
    t0 = time.time()
    snark = gen_snark(circuit, protocol, srs, scheme="shplonk")
    snarks = [snark] * args.n
    print(f"host prove (1 snark, replicated x{args.n}): {time.time()-t0:.2f}s")

    t0 = time.time()
    oks = batch_verify(snarks, srs, "shplonk")
    print(f"batch verify: {time.time()-t0:.1f}s -> {[bool(v) for v in oks]}")

    t0 = time.time()
    lhs, rhs = aggregate(snarks, srs, "shplonk")
    ok = bool(jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs))
    print(f"aggregate fold + ONE pairing: {time.time()-t0:.1f}s -> accepted={ok}")

    # negative control: a corrupted member must poison the fold
    bad = Snark(
        protocol=protocol,
        instances=[[(snark.instances[0][0] + 1) % FR.p]],
        scalars=snark.scalars,
        points=snark.points,
    )
    lhs2, rhs2 = aggregate(snarks[:-1] + [bad], srs, "shplonk")
    ok2 = bool(jax.jit(lambda l, r: decide(srs, l, r))(lhs2, rhs2))
    print(f"corrupted member rejected={not ok2}")
    if not ok or ok2:
        raise SystemExit("FAIL")
    print("PASS")


if __name__ == "__main__":
    main()

"""Command-line driver for snark_verifier_tpu.

The reference ships no CLI (its entry points are Rust examples/benches —
SURVEY.md §1 L6); this module is the equivalent front door:

    python -m snark_verifier_tpu verify     [--scheme shplonk|gwc] [--k 3]
    python -m snark_verifier_tpu aggregate  [--n 4]
    python -m snark_verifier_tpu tree       [--n 16] [--fanout 4]
    python -m snark_verifier_tpu bench-msm  [--log2n 16] [--backend rns|limb]

All subcommands accept --cpu to force the CPU backend (useful off-TPU).
"""

from __future__ import annotations

import argparse
import os
import sys


def _setup(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.getcwd(), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def cmd_verify(args):
    sys.argv = ["verify", "--scheme", args.scheme, "--k", str(args.k)] + (
        ["--cpu"] if args.cpu else []
    )
    from examples import verify_standard_plonk  # repo-root execution

    verify_standard_plonk.main()


def cmd_aggregate(args):
    sys.argv = ["aggregate", "--n", str(args.n)] + (["--cpu"] if args.cpu else [])
    from examples import aggregate_proofs

    aggregate_proofs.main()


def cmd_aggregate_mixed(args):
    from examples import aggregate_mixed

    aggregate_mixed.main(["--cpu"] if args.cpu else [])


def cmd_tree(args):
    jax = _setup(args)
    import time

    from snark_verifier_tpu.pcs.kzg.decider import decide
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.sdk.tree_aggregation import tree_aggregate
    from snark_verifier_tpu.system.standard_plonk import (
        StandardPlonk,
        build_protocol,
        gen_snark,
    )

    srs = toy_srs(32)
    circuit = StandardPlonk.rand(k=3, seed=7)
    protocol = build_protocol(circuit, srs)
    snark = gen_snark(circuit, protocol, srs, scheme="shplonk")
    snarks = [snark] * args.n
    t0 = time.time()
    lhs, rhs = tree_aggregate(snarks, srs, "shplonk", fanout=args.fanout)
    import jax as _jax

    ok = bool(_jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs))
    print(f"tree-aggregated {args.n} leaves (fanout {args.fanout}) in "
          f"{time.time()-t0:.1f}s -> accepted={ok}")
    if not ok:
        raise SystemExit("FAIL")
    print("PASS")


def cmd_gen_evm_verifier(args):
    """Emit a standalone Yul verifier contract for a protocol and (unless
    --no-check) prove + execute it in the in-process evaluator (the
    reference's gen_evm_verifier_* + evm_verify, evm.rs:122-192)."""
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side codegen path
    from snark_verifier_tpu.sdk.evm import evm_verify, gen_evm_verifier_report
    from snark_verifier_tpu.sdk.proof_io import proof_to_bytes
    from snark_verifier_tpu.sdk.snark import Snark
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.system.standard_plonk import (
        StandardPlonk,
        build_protocol,
        prove,
    )
    from snark_verifier_tpu.transcript import EvmTranscriptPy

    srs = toy_srs(max(32, 4 << args.k))
    circuit = StandardPlonk.rand(k=args.k, seed=11)
    protocol = build_protocol(circuit, srs)
    t0 = time.time()
    yul, rep = gen_evm_verifier_report(protocol, srs, args.scheme)
    with open(args.out, "w") as f:
        f.write(yul)
    print(f"wrote {args.out}: {len(yul)} bytes of Yul in {time.time()-t0:.2f}s")
    print(f"estimated gas: {rep['estimated_gas']}  "
          f"estimated code size: {rep['estimated_code_size']} "
          f"(EIP-170 limit 24576)")
    if not args.no_check:
        t = EvmTranscriptPy()
        scalars, points = prove(circuit, protocol, srs, scheme=args.scheme,
                                transcript=t)
        snark = Snark(protocol, [list(circuit.instance)], scalars, points)
        gas = evm_verify(yul, snark.instances,
                         proof_to_bytes(snark, args.scheme, fmt="evm"))
        print(f"executed generated verifier on a real proof: gas_used={gas}")
        print("PASS")


def cmd_bench_msm(args):
    os.environ["BENCH_LOG2N"] = str(args.log2n)
    os.environ["BENCH_BACKEND"] = args.backend
    _setup(args)
    import bench  # repo-root bench harness

    bench.main()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="snark_verifier_tpu")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--cpu", action="store_true", help="force CPU backend")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("verify", parents=[common],
                       help="prove + verify one StandardPlonk proof")
    v.add_argument("--scheme", default="shplonk", choices=["shplonk", "gwc"])
    v.add_argument("--k", type=int, default=3)

    a = sub.add_parser("aggregate", parents=[common], help="batch verify + fold N proofs")
    a.add_argument("--n", type=int, default=4)

    sub.add_parser("aggregate-mixed", parents=[common],
                   help="fold snarks of two different protocols into one "
                        "pairing (zkevm+state shape)")

    t = sub.add_parser("tree", parents=[common], help="two-layer recursive aggregation")
    t.add_argument("--n", type=int, default=16)
    t.add_argument("--fanout", type=int, default=4)

    b = sub.add_parser("bench-msm", parents=[common], help="Pippenger MSM benchmark")
    b.add_argument("--log2n", type=int, default=16)
    b.add_argument("--backend", default="rns", choices=["rns", "limb"])

    g = sub.add_parser("gen-evm-verifier", parents=[common],
                       help="emit + execute a Yul verifier contract")
    g.add_argument("--scheme", default="shplonk", choices=["shplonk", "gwc"])
    g.add_argument("--k", type=int, default=3)
    g.add_argument("--out", default="verifier.yul")
    g.add_argument("--no-check", action="store_true")

    args = ap.parse_args(argv)
    from snark_verifier_tpu.utils.timing import METER

    METER.start(args.cmd)
    try:
        {
            "verify": cmd_verify,
            "aggregate": cmd_aggregate,
            "aggregate-mixed": cmd_aggregate_mixed,
            "tree": cmd_tree,
            "bench-msm": cmd_bench_msm,
            "gen-evm-verifier": cmd_gen_evm_verifier,
        }[args.cmd](args)
    finally:
        METER.end(args.cmd)
        rep = METER.report()
        if rep:
            # per-span symbolic work counts — the gas-log analogue
            # (reference loader/evm/loader.rs:424-441)
            print(f"# cost-meter\n# {rep}", file=sys.stderr)


if __name__ == "__main__":
    main()

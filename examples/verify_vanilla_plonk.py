"""End-to-end: prove + verify a vanilla-PLONK circuit with copy constraints,
a lookup argument, and a phase-1 witness bound to a phase-0 user challenge —
the full halo2 verification equation on device (reference example analogue:
/root/reference/snark-verifier/examples/evm-verifier.rs flow, with the
system frontend swapped for system/vanilla_plonk).

Run:  python -m examples.verify_vanilla_plonk [--scheme shplonk|gwc] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="shplonk", choices=["shplonk", "gwc"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.getcwd(), ".jax_cache_cpu" if args.cpu
                                   else ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_vanilla_plonk import make_assignment, make_spec

    from snark_verifier_tpu.sdk import proof_io
    from snark_verifier_tpu.sdk.aggregation import batch_verify
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.system.vanilla_plonk import compile_protocol, gen_snark

    spec = make_spec()
    asg = make_assignment(spec)
    srs = toy_srs(8 * spec.n)
    protocol = compile_protocol(spec, asg.fixed, asg.copies, srs)
    print(f"protocol: {len(protocol.preprocessed)} preprocessed, "
          f"witness groups {protocol.num_witness}, "
          f"challenges {protocol.num_challenge}, "
          f"{protocol.quotient.num_chunk()} quotient chunks")

    t0 = time.time()
    snark = gen_snark(asg, protocol, srs, scheme=args.scheme)
    print(f"proved in {time.time()-t0:.1f}s "
          f"({len(snark.points)} points, {len(snark.scalars)} scalars)")

    data = proof_io.proof_to_bytes(snark, args.scheme)
    print(f"proof bytes: {len(data)}")
    again = proof_io.proof_from_bytes(protocol, snark.instances, data, args.scheme)

    t0 = time.time()
    ok = bool(batch_verify([again], srs, args.scheme).all())
    print(f"verified in {time.time()-t0:.1f}s (compile-dominated): {ok}")
    if not ok:
        raise SystemExit("FAIL")
    print("PASS")


if __name__ == "__main__":
    main()

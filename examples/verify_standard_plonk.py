"""E2E driver: prove a StandardPlonk circuit on the host, verify on device.

The TPU-native counterpart of the reference's `examples/evm-verifier.rs`
single-proof flow (/root/reference/snark-verifier/examples/evm-verifier.rs:
224-268) — prove, verify succinctly, decide the accumulator with a pairing.

Usage:  python examples/verify_standard_plonk.py [--scheme shplonk|gwc] [--k 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="shplonk", choices=["shplonk", "gwc"])
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from snark_verifier_tpu.ec import from_affine_int
    from snark_verifier_tpu.ff import FR_FIELD
    from snark_verifier_tpu.ff.spec import FR
    from snark_verifier_tpu.pcs.kzg.decider import decide_all
    from snark_verifier_tpu.pcs.kzg.multiopen import Bdfg21, Gwc19
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.system.standard_plonk import (
        StandardPlonk,
        build_protocol,
        prove,
    )
    from snark_verifier_tpu.transcript import PoseidonTranscript
    from snark_verifier_tpu.verifier.plonk.verifier import PlonkSuccinctVerifier

    scheme = Bdfg21 if args.scheme == "shplonk" else Gwc19
    print(f"backend={jax.default_backend()} scheme={args.scheme} k={args.k}")

    srs = toy_srs(1 << max(args.k + 2, 5))
    circuit = StandardPlonk.rand(k=args.k, seed=1)
    protocol = build_protocol(circuit, srs)

    t0 = time.time()
    scalars, points = prove(circuit, protocol, srs, scheme=args.scheme)
    print(f"host prove: {time.time()-t0:.2f}s "
          f"({len(scalars)} scalars, {len(points)} points)")

    sc = jnp.stack([FR_FIELD.from_int(s) for s in scalars], 0)
    pts = from_affine_int(points)[:, :2, :]
    instances = [[FR_FIELD.from_int(v) for v in circuit.instance]]

    t0 = time.time()
    td = PoseidonTranscript(scalars=sc, points=pts)
    proof = PlonkSuccinctVerifier.read_proof(protocol, instances, td, scheme)
    accs = PlonkSuccinctVerifier.verify(srs.g_dev, protocol, instances, proof, scheme)
    ok = bool(jax.jit(lambda a: decide_all(srs, a))(accs).all())
    print(f"device verify+decide: {time.time()-t0:.2f}s -> accepted={ok}")

    # negative control: wrong public input must be rejected
    bad = [[FR_FIELD.from_int((circuit.instance[0] + 1) % FR.p)]]
    td2 = PoseidonTranscript(scalars=sc, points=pts)
    proof2 = PlonkSuccinctVerifier.read_proof(protocol, bad, td2, scheme)
    accs2 = PlonkSuccinctVerifier.verify(srs.g_dev, protocol, bad, proof2, scheme)
    ok2 = bool(jax.jit(lambda a: decide_all(srs, a))(accs2).all())
    print(f"tampered instance rejected={not ok2}")
    if not ok or ok2:
        raise SystemExit("FAIL")
    print("PASS")


if __name__ == "__main__":
    main()

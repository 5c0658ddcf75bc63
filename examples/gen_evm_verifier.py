"""E2E: generate a standalone Yul verifier contract for a StandardPlonk
protocol, prove, and execute the contract in-process (the analogue of the
reference's examples/evm-verifier.rs:224-268 with the in-repo Yul evaluator
standing in for revm)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="shplonk", choices=["shplonk", "gwc"])
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # codegen + interpreter are host-side

    from snark_verifier_tpu import errors
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
    circuit = StandardPlonk.rand(k=args.k, seed=42)
    protocol = build_protocol(circuit, srs)

    yul, rep = gen_evm_verifier_report(protocol, srs, args.scheme)
    print(f"generated verifier: {len(yul)} bytes Yul, "
          f"~{rep['estimated_code_size']} bytes bytecode, "
          f"~{rep['estimated_gas']} gas (analytic)")
    assert rep["estimated_code_size"] <= 24576

    t = EvmTranscriptPy()
    scalars, points = prove(circuit, protocol, srs, scheme=args.scheme, transcript=t)
    snark = Snark(protocol, [list(circuit.instance)], scalars, points)
    proof = proof_to_bytes(snark, args.scheme, fmt="evm")
    gas = evm_verify(yul, snark.instances, proof)
    print(f"accepted real proof: gas_used={gas}")

    bad = bytearray(proof)
    bad[1] ^= 1
    try:
        evm_verify(yul, snark.instances, bytes(bad))
        raise SystemExit("FAIL: tampered proof accepted")
    except errors.AssertionFailure:
        print("rejected tampered proof (revert)")
    print("PASS")


if __name__ == "__main__":
    main()

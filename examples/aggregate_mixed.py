"""Mixed-protocol aggregation — the reference's zkevm+state shape
(/root/reference/snark-verifier-sdk/benches/zkevm_plus_state.rs): two
DIFFERENT circuits verified in shape-specialized batched kernels, their
accumulators folded cross-group into ONE deferred pairing.

Usage: python examples/aggregate_mixed.py [--cpu]
"""

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from snark_verifier_tpu.ff.spec import FR
    from snark_verifier_tpu.sdk.aggregation import (
        aggregate_heterogeneous_and_decide,
    )
    from snark_verifier_tpu.sdk.snark import Snark
    from snark_verifier_tpu.sdk.srs import toy_srs
    from snark_verifier_tpu.system import standard_plonk as sp
    from snark_verifier_tpu.system import linearized_plonk as lp

    srs = toy_srs(64)

    # family A: StandardPlonk (instance-bound gate), 3 snarks
    base = sp.StandardPlonk.rand(k=3, seed=9)
    proto_a = sp.build_protocol(base, srs)
    snarks = []
    for i in range(3):
        c = sp.StandardPlonk.rand(k=3, seed=9).set_instance(
            [(base.instance[0] + 13 * i) % FR.p]
        )
        snarks.append(sp.gen_snark(c, proto_a, srs, scheme="shplonk"))

    # family B: linearized PLONK (different gate structure AND a different
    # linearization strategy), 2 snarks
    circ_b = lp.LinearizedPlonk.rand(k=3, seed=4)
    proto_b = lp.compile_protocol(circ_b, srs, strategy=lp.MINUS_VANISHING)
    snarks.insert(1, lp.gen_snark(circ_b, proto_b, srs, "shplonk"))
    snarks.append(lp.gen_snark(circ_b, proto_b, srs, "shplonk"))

    assert proto_a.content_hash() != proto_b.content_hash()
    t0 = time.time()
    ok = bool(aggregate_heterogeneous_and_decide(snarks, srs, "shplonk"))
    print(f"aggregated {len(snarks)} snarks across 2 protocols "
          f"(interleaved order) -> one pairing in {time.time()-t0:.1f}s: "
          f"accepted={ok}")
    assert ok, "valid mixed batch must decide true"

    # tamper one member: the single root pairing must reject
    bad = Snark(snarks[0].protocol,
                [[(snarks[0].instances[0][0] + 1) % FR.p]],
                snarks[0].scalars, snarks[0].points)
    ok2 = bool(aggregate_heterogeneous_and_decide([bad] + snarks[1:], srs,
                                                  "shplonk"))
    print(f"tampered member -> accepted={ok2}")
    assert not ok2, "tampered batch must decide false"
    print("PASS")


if __name__ == "__main__":
    main()

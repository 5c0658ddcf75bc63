"""Generate the committed bench fixtures: M distinct vanilla-PLONK snarks at
k=10 (full verification equation) + protocol + SRS, so `bench.py`'s verify
phase measures the honest workload without re-proving at bench time.
Usage: python benchmarks/gen_fixtures.py [K] [M] [scheme]
  scheme=all (default): shplonk + keccak-transcript twins
  scheme=gwc: only the GWC19-multiopen family (gwcsnark_*, BENCH_SCHEME=gwc)"""
import json, os, sys, time

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from snark_verifier_tpu.sdk.srs import toy_srs, save_params
from snark_verifier_tpu.system.vanilla_fixtures import demo_assignment, demo_spec
from snark_verifier_tpu.system.vanilla_plonk import compile_protocol, gen_snark

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
M = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SCHEME = sys.argv[3] if len(sys.argv) > 3 else "all"
out = os.path.join(os.path.dirname(__file__), "fixtures", f"vanilla_k{K}")
os.makedirs(out, exist_ok=True)

srs = toy_srs(8 << K)
spec = demo_spec(K)
asg0 = demo_assignment(spec, seed=0)
protocol = compile_protocol(spec, asg0.fixed, asg0.copies, srs)
with open(os.path.join(out, "protocol.json"), "w") as f:
    json.dump(protocol.to_json(), f)
save_params(srs, os.path.join(out, "srs.bin"))
if SCHEME == "gwc":
    for i in range(M):
        t0 = time.time()
        asg = demo_assignment(spec, seed=i)
        snark = gen_snark(asg, protocol, srs, scheme="gwc", seed=i)
        snark.save(os.path.join(out, f"gwcsnark_{i:02d}.json"))
        print(f"gwc snark {i}: {time.time()-t0:.1f}s", flush=True)
    print("done", flush=True)
    sys.exit(0)
for i in range(M):
    t0 = time.time()
    asg = demo_assignment(spec, seed=i)
    snark = gen_snark(asg, protocol, srs, scheme="shplonk", seed=i)
    snark.save(os.path.join(out, f"snark_{i:02d}.json"))
    print(f"snark {i}: {time.time()-t0:.1f}s", flush=True)
# keccak-transcript twins (the on-chain family; BENCH_TRANSCRIPT=evm)
for i in range(M):
    t0 = time.time()
    asg = demo_assignment(spec, seed=i)
    snark = gen_snark(asg, protocol, srs, scheme="shplonk", seed=i,
                      transcript="evm")
    snark.save(os.path.join(out, f"evmsnark_{i:02d}.json"))
    print(f"evm snark {i}: {time.time()-t0:.1f}s", flush=True)
print("done", flush=True)

"""Profile the batched succinct-verify phase on TPU and aggregate device op
time by op category from the Perfetto trace.
Usage: python benchmarks/profile_verify.py [BATCH]"""
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

from snark_verifier_tpu.parallel.batch_verify import (
    batch_decide_sharded,
    batch_succinct_verify_sharded,
)
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import load_params

d = os.path.join("/root/repo", "benchmarks", "fixtures", "vanilla_k10")
srs = load_params(os.path.join(d, "srs.bin"))
base = [Snark.load(os.path.join(d, n)) for n in sorted(os.listdir(d))
        if n.startswith("snark_")]
snarks = [base[i % len(base)] for i in range(B)]
mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("batch",))

t0 = time.time()
accs = batch_succinct_verify_sharded(snarks, srs, mesh, "shplonk")
jax.block_until_ready(accs)
np.asarray(jax.device_get(accs[0][0].ravel()[:1]))
print(f"# succinct compile+first: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
accs = batch_succinct_verify_sharded(snarks, srs, mesh, "shplonk")
np.asarray(jax.device_get(accs[0][0].ravel()[:1]))
print(f"# succinct warm: {time.time()-t0:.1f}s", flush=True)

trace_dir = "/tmp/verify_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    accs = batch_succinct_verify_sharded(snarks, srs, mesh, "shplonk")
    np.asarray(jax.device_get(accs[0][0].ravel()[:1]))

# aggregate device-side op durations from the perfetto trace
paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print(f"# trace files: {paths}", flush=True)
agg = {}
total = 0.0
for path in paths:
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    # find device track pids (names containing 'TPU' and not 'python')
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "tpu" in nm:
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids and "dur" in ev:
            name = ev.get("name", "?")
            # strip uniquifying suffixes: fusion.123 -> fusion
            base_name = name.split(".")[0]
            a = agg.setdefault(base_name, [0.0, 0])
            a[0] += ev["dur"] / 1e6
            a[1] += 1
            total += ev["dur"] / 1e6

print(f"# device total: {total:.2f}s", flush=True)
for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
    print(f"# {dur:8.3f}s  n={cnt:6d}  {name}", flush=True)

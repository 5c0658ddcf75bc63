"""Weak-scaling measurement of the point-sharded MSM on the virtual CPU mesh.

Fixed per-device work (n points per device), D = 1, 2, 4, 8 virtual devices.
CAVEAT (printed with the numbers): the 8 virtual devices share this host's 2
physical cores, so wall time grows with total work once D exceeds the core
count — this run measures that the sharded program EXECUTES correctly at
every D and that its collective volume stays O(D); it cannot demonstrate
chip-level scaling (one physical TPU chip is attached).  The chip-side
efficiency claim is carried by the measured collective inventory + the ICI
model in parallel/comm_model.py and SCALING.md.

Usage: python benchmarks/scaling_weak.py [log2_n_per_device]
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.msm import scalars_from_int
from snark_verifier_tpu.parallel.comm_model import collective_inventory
from snark_verifier_tpu.parallel.msm_sharded import msm_sharded

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
NPER = 1 << LOG2N
NCORES = os.cpu_count()

results = []
for D in (1, 2, 4, 8):
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:D]), ("points",))
    n = NPER * D
    pts_int = py_ec.rand_points(4, seed=1)
    pts = from_affine_int([pts_int[i % 4] for i in range(n)])
    # UNIFORM scalars: the bucket-capacity model assumes them (an arithmetic
    # progression clusters window digits and overflows the static capacity)
    rng = np.random.default_rng(D)
    ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(n)]
    scs = scalars_from_int(ks)

    fn = jax.jit(lambda p, s: msm_sharded(p, s, mesh))
    inv = collective_inventory(fn, pts, scs, optimized=False)
    t0 = time.time()
    out, ovf = fn(pts, scs)
    out.block_until_ready()
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out, ovf = fn(pts, scs)
        out.block_until_ready()
        times.append(time.time() - t0)
    dt = min(times)
    # correctness at every D
    want = py_ec.msm([pts_int[i % 4] for i in range(n)], ks)
    assert not bool(ovf), f"D={D}: bucket overflow (retry with capacity)"
    assert to_affine_int(out) == want, f"D={D} wrong result"
    results.append({
        "D": D, "n_per_device": NPER, "wall_s": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "coll_bytes": inv["total_bytes"], "coll_count": inv["count"],
        "correct": True,
    })
    print(f"# D={D} n/dev=2^{LOG2N} wall={dt:.3f}s "
          f"coll={inv['total_bytes']}B x{inv['count']}", flush=True)

base = results[0]["wall_s"]
for r in results:
    # host-core-bound expectation: time grows ~ total_work / min(D, cores)
    r["wall_vs_D1"] = round(r["wall_s"] / base, 2)
print(json.dumps({
    "host_cores": NCORES,
    "caveat": "virtual devices share host cores; wall ratios are "
              "host-core-bound, not chip-scaling evidence (see SCALING.md)",
    "collective_bytes_scale": "O(D)",
    "runs": results,
}, indent=1))

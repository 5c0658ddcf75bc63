"""Measure compile+run time of the chunked Pallas bucket-fold at production
MSM shapes (2^20, c=8: bucket matrix (256, ~4624, 105) u16 per window).

Round-2 finding: the K=8 fold levels exceeded the remote Mosaic compile
budget at these shapes.  This probe times each level kernel separately for
K in {2, 4, 8} so we can pick the largest K whose levels all compile in
acceptable time (the levels are cached by shape, so this is a one-time cost
per (n, capacity, c)).

Usage:  python benchmarks/micro_pallas_fold20.py [K] [CAP] [NB]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns  # noqa: E402
from snark_verifier_tpu.ec import from_affine_int, py_ec, to_affine_int  # noqa: E402
from snark_verifier_tpu.msm.pallas_ops import _pallas_fold_level  # noqa: E402


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4624
    NB = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    # input: bucket matrix where each slot is either G or infinity, so the
    # expected bucket sum is [count]G — self-checkable
    g = py_ec.G1_GEN
    pts = to_rns(from_affine_int([g]))  # (1, 3, 35)
    g_flat = np.asarray(pts).reshape(-1)  # (105,)
    inf_flat = np.asarray(G1R.infinity()).reshape(-1)

    rng = np.random.default_rng(1)
    fill = rng.integers(0, 2, size=(NB, cap)).astype(bool)
    mat = np.where(fill[..., None], g_flat, inf_flat).astype(np.uint16)
    mat = jnp.asarray(mat)
    counts = fill.sum(1)

    identity_row = jnp.asarray(inf_flat)

    def sync(x):
        np.asarray(jax.device_get(x.ravel()[:1]))

    w = cap
    level = 0
    total_compile = 0.0
    total_run = 0.0
    while w > 1:
        pad = (-w) % K
        if pad:
            fillr = jnp.broadcast_to(identity_row, (NB, pad, 105))
            mat = jnp.concatenate([mat, fillr], axis=1)
            w += pad
        t0 = time.time()
        out = _pallas_fold_level(mat, K)
        sync(out)
        dt = time.time() - t0
        t0 = time.time()
        out = _pallas_fold_level(mat, K)
        sync(out)
        rt = time.time() - t0
        print(f"# level {level}: ({NB},{w},105) -> ({NB},{w//K},105)  "
              f"compile+run {dt:.1f}s  run {rt:.3f}s", flush=True)
        total_compile += dt
        total_run += rt
        mat = out
        w //= K
        level += 1

    # self-check: folded bucket sums == [count]G
    got = to_affine_int(from_rns(mat[:, 0].reshape(NB, 3, 35)))
    ok = all(
        (got[i] == py_ec.scalar_mul(g, int(counts[i]))) if counts[i] else True
        for i in range(min(NB, 8))
    )
    print(f"# K={K} cap={cap} NB={NB}: levels={level} "
          f"compile_total={total_compile:.1f}s run_total={total_run:.3f}s "
          f"correct={ok}", flush=True)


if __name__ == "__main__":
    main()

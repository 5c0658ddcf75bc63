"""Compile+run probe for the no-reshape halving fold at production MSM
shapes ((256, 4624, 105) u16 per window at 2^20, c=8).
Usage: python benchmarks/micro_pallas_halving.py [LAYERS] [CAP] [NB]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns
from snark_verifier_tpu.ec import from_affine_int, to_affine_int, py_ec
from snark_verifier_tpu.msm.pallas_ops import _pallas_fold_halving

def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4624
    NB = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    g = py_ec.G1_GEN
    g_flat = np.asarray(to_rns(from_affine_int([g]))).reshape(-1)
    inf_flat = np.asarray(G1R.infinity()).reshape(-1)
    rng = np.random.default_rng(1)
    fill = rng.integers(0, 2, size=(NB, cap)).astype(bool)
    mat = jnp.asarray(np.where(fill[..., None], g_flat, inf_flat).astype(np.uint16))
    counts = fill.sum(1)
    identity = jnp.asarray(inf_flat)
    sync = lambda x: np.asarray(jax.device_get(x.ravel()[:1]))
    w, level = cap, 0
    while w > 1:
        lyr = min(layers, (w - 1).bit_length())
        step = 1 << lyr
        pad = (-w) % step
        if pad:
            mat = jnp.concatenate([mat, jnp.broadcast_to(identity, (NB, pad, 105))], 1)
            w += pad
        t0 = time.time(); out = _pallas_fold_halving(mat, lyr); sync(out)
        dt = time.time() - t0
        t0 = time.time(); out = _pallas_fold_halving(mat, lyr); sync(out)
        rt = time.time() - t0
        print(f"# level {level}: w={w} layers={lyr} compile+run {dt:.1f}s run {rt:.3f}s", flush=True)
        mat = out; w >>= lyr; level += 1
    got = [to_affine_int(from_rns(np.asarray(mat[i, 0]).reshape(3, 35))) for i in range(min(NB, 8))]
    want = [py_ec.scalar_mul(g, int(counts[i])) if counts[i] else None for i in range(min(NB, 8))]
    print(f"# correct={got == want}", flush=True)

main()

"""TPU probe: packed (105-lane) fold kernel vs the per-coordinate fold at
production MSM shapes.
Usage: python benchmarks/micro_pallas_packed.py [WB] [LAYERS] [CAP] [NB]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns
from snark_verifier_tpu.ec import from_affine_int, to_affine_int, py_ec
from snark_verifier_tpu.msm.pallas_ops import fold_buckets_grid, fold_buckets_grid_pk

wb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
cap = int(sys.argv[3]) if len(sys.argv) > 3 else 4624
NB = int(sys.argv[4]) if len(sys.argv) > 4 else 256
both = "--both" in sys.argv
g = py_ec.G1_GEN
g_flat = np.asarray(to_rns(from_affine_int([g]))).reshape(-1)
inf_flat = np.asarray(G1R.infinity()).reshape(-1)
rng = np.random.default_rng(1)
fill = rng.integers(0, 2, size=(NB, cap)).astype(bool)
mat = jnp.asarray(np.where(fill[..., None], g_flat, inf_flat).astype(np.uint16))
identity = jnp.asarray(inf_flat)
sync = lambda x: np.asarray(jax.device_get(x.ravel()[:1]))

def bench(name, fold):
    fn = jax.jit(lambda m: fold(m, identity, wb=wb, layers=layers))
    t0 = time.time(); out = fn(mat); sync(out)
    print(f"# [{name}] wb={wb} layers={layers} compile+run {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); out = fn(mat); sync(out)
        best = min(best, time.time() - t0)
    print(f"# [{name}] best run {best:.3f}s  ({NB*cap/best/1e6:.1f}M slots/s)", flush=True)
    got = [to_affine_int(from_rns(np.asarray(out[i]).reshape(3, 35))) for i in range(8)]
    want = [py_ec.scalar_mul(g, int(fill[i].sum())) if fill[i].sum() else None for i in range(8)]
    print(f"# [{name}] correct={got == want}", flush=True)
    return best

t_pk = bench("packed", fold_buckets_grid_pk)
if both:
    t_un = bench("unpacked", fold_buckets_grid)
    print(f"# speedup: {t_un/t_pk:.2f}x", flush=True)

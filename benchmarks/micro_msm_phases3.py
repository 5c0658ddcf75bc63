"""Round-3 phase timing of the host-orchestrated Pallas MSM at 2^20."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from snark_verifier_tpu.ec import py_ec, to_affine_int
from snark_verifier_tpu.ff.spec import FR, int_to_limbs
from snark_verifier_tpu.utils import native
from snark_verifier_tpu.msm.pippenger import (
    _slot_indices, extract_digits, top_range, top_capacity, default_capacity,
    _fold_buckets_pallas, _weighted_bucket_sum, _horner, _pjit)
from snark_verifier_tpu.ec.rns_g1 import G1R, from_rns, to_rns

log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << log2n
c = 8
nb = 1 << c
cap = default_capacity(n, nb)
trange, tcap = top_range(c), max(cap, top_capacity(n, c))
points = jnp.asarray(native.enumerate_points_dev(n))
rng = np.random.default_rng(42)
ks = [int.from_bytes(rng.bytes(32), "little") % FR.p for i in range(n)]
scalars = jnp.asarray(np.stack([int_to_limbs(k) for k in ks]))
sync = lambda x: np.asarray(jax.device_get(x.ravel()[:1]))

def prep(points, scalars):
    points_ext = jnp.concatenate([to_rns(points), G1R.infinity((1,))], 0)
    digits = extract_digits(scalars, c)
    idx_all, overflow = _slot_indices(digits[:-1], nb, cap)
    top_idx, top_o = _slot_indices(digits[-1:], trange, tcap)
    return points_ext, idx_all, top_idx[0], overflow | top_o

pjit = jax.jit(prep)
t0=time.time(); pe, idx_all, top_idx, ovf = pjit(points, scalars); sync(idx_all)
print(f"# prep compile+run {time.time()-t0:.1f}s", flush=True)
for r in range(2):
    t0=time.time(); pe, idx_all, top_idx, ovf = pjit(points, scalars); sync(idx_all)
    print(f"# prep run {time.time()-t0:.3f}s", flush=True)

fold = jax.jit(lambda pe, idx: _fold_buckets_pallas(G1R, pe, idx))
t0=time.time(); b0 = fold(pe, idx_all[0]); sync(b0)
print(f"# fold compile+first {time.time()-t0:.1f}s", flush=True)
t0=time.time()
buckets = [fold(pe, idx_all[w]) for w in range(idx_all.shape[0])]
sync(buckets[-1])
dt = time.time()-t0
print(f"# fold x{idx_all.shape[0]} {dt:.2f}s ({dt/idx_all.shape[0]*1000:.0f}ms each)", flush=True)
foldt = jax.jit(lambda pe, idx: _fold_buckets_pallas(G1R, pe, idx))
t0=time.time(); tb = foldt(pe, top_idx); sync(tb)
print(f"# top fold compile+run {time.time()-t0:.1f}s", flush=True)

def combine(buckets, top_b):
    wsums = _weighted_bucket_sum(G1R, buckets)
    top_sum = _weighted_bucket_sum(G1R, top_b[None])
    wsums = jnp.concatenate([wsums, top_sum], axis=0)
    return from_rns(_horner(G1R, wsums, c))
cjit = jax.jit(combine)
bst = jnp.stack([b.reshape(nb, 3, 35) for b in buckets], 0)
tbr = tb.reshape(trange, 3, 35)
t0=time.time(); out = cjit(bst, tbr); sync(out)
print(f"# combine compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time(); out = cjit(bst, tbr); sync(out)
print(f"# combine run {time.time()-t0:.3f}s", flush=True)
k_total = sum(s * (i + 1) for i, s in enumerate(ks)) % FR.p
want = py_ec.scalar_mul(py_ec.G1_GEN, k_total)
print(f"# correct={to_affine_int(out) == want} overflow={bool(ovf)}", flush=True)

"""Dissect the packed RC15 add kernel: which component eats the time?
Runs a chain of CH packed adds on resident (B, 105) VMEM data with pieces
selectively stubbed (wrong math where stubbed — perf probe only).
Usage: python benchmarks/micro_packed_dissect.py [B] [CH]"""
import sys, time, types, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from snark_verifier_tpu.ff import rns_packed as rpk
from snark_verifier_tpu.msm import pallas_ops as po
from snark_verifier_tpu.ec.rns_g1 import FQ_RNS
from snark_verifier_tpu.ff import FQ

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 16

rng = np.random.default_rng(2)
vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % FQ.p
        for _ in range(B * 2 * 3)]
elems = np.asarray(FQ_RNS.from_int(vals)).reshape(2, B, 105).astype(np.uint16)
sync = lambda x: np.asarray(jax.device_get(x.ravel()[:1]))


def run(name, variant):
    def kernel(*refs):
        *const_refs, a_ref, b_ref, o_ref = refs
        F = po._kernel_field_packed(const_refs)
        if variant == "noroll":
            F._roll = types.MethodType(lambda self, v, s: v, F)
        if variant == "noext":
            F._ext = types.MethodType(
                lambda self, sigma, rhs, nfolds=3: self._fold(sigma, 2), F)
        a, b = a_ref[:], b_ref[:]
        for _ in range(CH):
            if variant == "lazyonly":
                d = F.lazy_add(F.mul_lazy(a, b), F.mul_lazy(b, a))
                a = (d & np.uint32(0xFFFF)).astype(jnp.uint16)
            elif variant == "reduceonly":
                a = F.reduce_d(F.mul_lazy(a, b))
            else:
                a = rpk.add_packed(F, a, b)
        o_ref[:] = a

    consts = po._packed_consts_host()
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 105), jnp.uint16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(consts) + 2),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda a, b: f(*consts, a, b))
    t0 = time.time(); out = fn(elems[0], elems[1]); sync(out)
    c = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); out = fn(elems[0], elems[1]); sync(out)
        best = min(best, time.time() - t0)
    per = best / CH
    print(f"# {name:12s} compile {c:5.1f}s  {per*1e6:8.1f}us/add-step "
          f"({B/per/1e6:6.1f}M adds/s)", flush=True)


run("full", "full")
run("noroll", "noroll")
run("noext", "noext")
run("lazyonly", "lazyonly")
run("reduceonly", "reduceonly")

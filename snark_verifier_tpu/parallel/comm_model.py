"""Communication accounting + ICI/DCN scaling model for the sharded layers.

The reference's only scaling mechanism is rayon chunk-reduce
(/root/reference/snark-verifier/src/util/msm.rs:290-310) — shared-memory, no
communication to account for.  The mesh layers here (parallel/msm_sharded.py,
parallel/batch_verify.py, sdk/tree_aggregation.py) communicate through XLA
collectives, and this module produces the two halves of the BASELINE
scaling-efficiency evidence:

1. `collective_inventory(fn, *args)` — the MEASURED side: compiles the jitted
   computation and extracts every collective op with its shape and byte
   volume from the optimized HLO.  This is ground truth for "how many bytes
   actually move per step" (not a hand model; if a rewrite accidentally
   introduces a fat collective, the dryrun artifact shows it).

2. `predict_efficiency(...)` — the WRITTEN model: weak-scaling efficiency of
   the point-sharded MSM from per-device compute time and link bandwidth.

Model (one MSM step, D devices, n points/device):

    T_comp(n)   measured single-chip Pippenger time (bench.py: 2.888 s at
                n = 2^20 on v5e => 363k points/s)
    V_coll(D)   all-gather volume: each device contributes one projective
                (3, 16)-u32 partial + bool overflow = 192 B (+1), gathered
                to D devices => D*193 B in, per device
    T_comm      = alpha * ceil(log2 D) + V_coll / BW_ici
                  alpha ~ 1 us/hop link latency, BW_ici ~ 4.5e10 B/s per
                  v5e ICI link (one-way, public "How to Scale Your Model"
                  numbers); DCN hop: alpha ~ 10 us, BW ~ 3.1e9 B/s/host
    T_fold      = ceil(log2 D) * T_ecadd_batch   (replicated halving fold of
                  the gathered partials; ~3 us per batched RNS EC add row)
    efficiency  = T_comp / (T_comp + T_comm + T_fold)

With D = 256 chips: V_coll = 49 KB => T_comm ≈ 8*1us + 49KB/4.5e10 ≈ 9 us,
T_fold ≈ 24 us against T_comp = 2.888 s — efficiency 99.99%.  The model
says the ≥80% BASELINE bar fails only if per-device work shrinks below
~n = 2^10 per chip or a rewrite makes the collective volume scale with n
(which `collective_inventory` in the dryrun artifact would expose).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLL_RE = re.compile(
    r"(\w[\w.\-]*)\s*=\s*(\([^)]*\)|[a-z0-9\[\],{} ]+?)\s*"
    r"(all-gather(?:-start)?|all-reduce(?:-start)?|reduce-scatter|"
    r"all-to-all|collective-permute(?:-start)?)\("
)

# unoptimized StableHLO form: "stablehlo.all_gather"(...) ... -> tensor<8x3x16xui32>
_STABLO_RE = re.compile(
    r"stablehlo\.(all_gather|all_reduce|all_to_all|collective_permute|"
    r"reduce_scatter)\"?\(.*?->\s*(tensor<[^>]+>(?:\s*,\s*tensor<[^>]+>)*)"
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_TENSOR_RE = re.compile(r"tensor<([^>]+)>")

_MLIR_DTYPE_BYTES = {
    "i1": 1, "i8": 1, "ui8": 1, "i16": 2, "ui16": 2, "bf16": 2, "f16": 2,
    "i32": 4, "ui32": 4, "f32": 4, "i64": 8, "ui64": 8, "f64": 8,
}


def _tensor_bytes(type_str: str) -> int:
    total = 0
    for inner in _TENSOR_RE.findall(type_str):
        parts = inner.split("x")
        dt = parts[-1]
        n = 1
        for d in parts[:-1]:
            n *= int(d)
        total += n * _MLIR_DTYPE_BYTES.get(dt, 4)
    return total


def _shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO result type (tuples summed)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                if d:
                    n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_inventory_from_text(hlo: str) -> List[Dict[str, Any]]:
    """Parse HLO (optimized text) or StableHLO (lowered MLIR) ->
    [{op, type, bytes}] for every collective."""
    out = []
    for m in _COLL_RE.finditer(hlo):
        name, type_str, op = m.groups()
        if op.endswith("-start"):
            op = op[: -len("-start")]
        out.append({
            "op": op,
            "type": type_str.strip(),
            "bytes": _shape_bytes(type_str),
        })
    if not out:
        for m in _STABLO_RE.finditer(hlo):
            op, type_str = m.groups()
            out.append({
                "op": op.replace("_", "-"),
                "type": type_str.strip(),
                "bytes": _tensor_bytes(type_str),
            })
    return out


def collective_inventory(fn, *args, optimized: bool = True, **kw) -> Dict[str, Any]:
    """Account the collectives of `fn(*args)` (jit-wrapped or plain).
    optimized=True compiles and reads final HLO (exact); optimized=False
    reads the lowered StableHLO only — no compile cost, same collectives for
    these layers (shard_map emits them explicitly at trace time).
    Returns {ops: [...], total_bytes, count} — the measured communication
    volume of ONE step of the computation."""
    import jax

    if hasattr(fn, "as_text") and not hasattr(fn, "lower"):
        # already-compiled executable (e.g. the AOT cache, sdk/aot.py)
        hlo = fn.as_text()
    else:
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        lowered = jitted.lower(*args, **kw)
        hlo = lowered.compile().as_text() if optimized else lowered.as_text()
    ops = collective_inventory_from_text(hlo)
    return {
        "ops": ops,
        "count": len(ops),
        "total_bytes": sum(o["bytes"] for o in ops),
    }


def predict_efficiency(
    n_per_device: int,
    n_devices: int,
    chip_points_per_sec: float = 363_000.0,
    coll_bytes_per_device: int = 193,
    bw_bytes_per_sec: float = 4.5e10,
    alpha_link_s: float = 1e-6,
    ecadd_row_s: float = 3e-6,
) -> Dict[str, float]:
    """Weak-scaling efficiency of the point-sharded MSM (module docstring
    model).  Defaults: v5e ICI; DCN crossings: pass bw=3.1e9, alpha=1e-5."""
    import math

    hops = max(1, math.ceil(math.log2(max(n_devices, 2))))
    t_comp = n_per_device / chip_points_per_sec
    v = coll_bytes_per_device * n_devices
    t_comm = alpha_link_s * hops + v / bw_bytes_per_sec
    t_fold = hops * ecadd_row_s
    eff = t_comp / (t_comp + t_comm + t_fold)
    return {
        "t_comp_s": t_comp,
        "t_comm_s": t_comm,
        "t_fold_s": t_fold,
        "gather_bytes": v,
        "efficiency": eff,
    }

"""Multi-chip MSM: shard the point axis over a device mesh.

MSM is linear over point subsets, so the distributed algorithm is: each device
runs the full windowed Pippenger kernel on its local shard, then the (3,16)
per-device partial results are all-gathered over ICI and tree-folded (log2(D)
EC adds, replicated).  This replaces the reference's rayon chunk-split +
sequential reduce (/root/reference/snark-verifier/src/util/msm.rs:290-310)
with mesh collectives.

Communication: one all_gather of D * 192 bytes — negligible vs compute, which
is why scaling efficiency stays near-linear (BASELINE.md target ≥80%).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ec.g1 import G1
from ..msm.pippenger import default_capacity, msm, msm_rns


def _tree_fold(parts):
    """Halving fold of a stack of points along axis 0 (handles odd widths)."""
    width = parts.shape[0]
    while width > 1:
        half = width // 2
        lo, hi = parts[:half], parts[half:width]
        if lo.shape[0] != hi.shape[0]:
            parts = jnp.concatenate(
                [G1.add(lo, hi[: lo.shape[0]]), hi[lo.shape[0]:]], 0
            )
        else:
            parts = G1.add(lo, hi)
        width = parts.shape[0]
    return parts[0]


def batch_msm_sharded(points, scalars_u16, mesh: Mesh,
                      batch_axis: str = "batch", points_axis: str = "points",
                      capacity: Optional[int] = None, backend: str = "auto"):
    """Batch of B MSMs sharded over a 2D mesh: data-parallel over the batch
    axis, point-sharded (the domain's tensor-parallel analogue) within each
    MSM.  points (B,n,3,16), scalars (B,n,16); B % mesh[batch_axis] == 0 and
    n % mesh[points_axis] == 0.  Returns ((B,3,16), (B,) overflow)."""
    ndev_p = mesh.shape[points_axis]
    n = points.shape[1]
    assert n % ndev_p == 0 and points.shape[0] % mesh.shape[batch_axis] == 0
    cap = capacity or default_capacity(n // ndev_p)
    kern = msm_rns if backend == "rns" or (
        backend == "auto" and n // ndev_p >= 4096
    ) else msm

    def local(pts, scs):  # (Bl, nl, 3, 16), (Bl, nl, 16)
        part, ovf = jax.vmap(lambda p, s: kern(p, s, capacity=cap))(pts, scs)
        parts = jax.lax.all_gather(part, points_axis)  # (D, Bl, 3, 16)
        parts = _tree_fold(parts)
        ovf_all = jax.lax.all_gather(ovf, points_axis).any(axis=0)
        return parts, ovf_all

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, points_axis), P(batch_axis, points_axis)),
        out_specs=(P(batch_axis), P(batch_axis)),
        check_vma=False,
    )
    return fn(points, scalars_u16)


def msm_sharded(points, scalars_u16, mesh: Mesh, axis_name: str = "points",
                capacity: Optional[int] = None, backend: str = "auto"):
    """Σ sᵢ·Pᵢ across a mesh axis.  points (n,3,16), scalars (n,16); n must be
    divisible by the mesh axis size (pad upstream with zero scalars).
    Returns (result (3,16) replicated, overflow flag)."""
    ndev = mesh.shape[axis_name]
    n = points.shape[0]
    assert n % ndev == 0, f"n={n} not divisible by mesh axis {ndev}"
    cap = capacity or default_capacity(n // ndev)
    kern = msm_rns if backend == "rns" or (
        backend == "auto" and n // ndev >= 4096
    ) else msm

    def local_msm(pts, scals):
        part, ovf = kern(pts, scals, capacity=cap)
        # (D, 3, 16) partials on every device, then a replicated tree fold.
        parts = _tree_fold(jax.lax.all_gather(part, axis_name))
        ovf_all = jax.lax.all_gather(ovf, axis_name).any()
        return parts, ovf_all

    fn = shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        # scan carries start as replicated constants and become device-varying
        # inside the body; skip the varying-manual-axes check.
        check_vma=False,
    )
    return fn(points, scalars_u16)

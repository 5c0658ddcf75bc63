"""Two-layer recursive aggregation: the TPU-idiomatic analogue of the
reference's recursion example (/root/reference/snark-verifier/examples/
recursion.rs — leaves are app proofs, inner nodes verify and fold, the root
is one pairing check; BASELINE config #5).

Layer 1 (data-parallel over the mesh): every device succinct-verifies its
shard of leaf proofs and KzgAs-folds them into one accumulator.
Layer 2 (replicated): the per-device accumulators are all-gathered over ICI
and folded again; the root accumulator costs ONE pairing.

Each fold runs its own Poseidon Fiat–Shamir transcript over the absorbed
accumulators (reference accumulation.rs:123-137), entirely on device.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..pcs.kzg.accumulation import KzgAs
from ..pcs.kzg.decider import decide
from ..sdk.aggregation import SCHEMES, _stack_instances, _stack_streams
from ..transcript import PoseidonTranscript
from ..verifier.plonk.verifier import PlonkSuccinctVerifier


def _fold(accs: List[Tuple], batch_shape=()):
    """KzgAs fold of a list of (lhs, rhs) projective pairs with a fresh
    device transcript (no ZK blind)."""
    td = PoseidonTranscript(
        scalars=jnp.zeros(batch_shape + (0, 16), jnp.uint32),
        points=jnp.zeros(batch_shape + (0, 2, 16), jnp.uint32),
        batch_shape=batch_shape,
    )
    proof = KzgAs.read_proof(False, accs, td)
    return KzgAs.verify(accs, proof)


def _fold_stacked(pairs):
    """Stacked KzgAs fold of (N, 2, 3, 16) accumulator pairs: O(1) graph
    size in N, and hierarchical (grouped-batched sponge chains) above 32
    accumulators — see pcs/kzg/accumulation.py::fold_hierarchical."""
    return KzgAs.fold_hierarchical(pairs)


def tree_aggregate(snarks: Sequence, srs, scheme_name: str = "shplonk",
                   fanout: int = 8):
    """Local two-layer fold: groups of `fanout` leaves -> group accumulators
    -> root accumulator.  Returns (lhs, rhs)."""
    protocol = snarks[0].protocol
    scheme = SCHEMES[scheme_name]
    groups = [snarks[i : i + fanout] for i in range(0, len(snarks), fanout)]
    group_accs = []
    for g in groups:
        sc, pts = _stack_streams(g)
        instances = _stack_instances(g)
        td = PoseidonTranscript(scalars=sc, points=pts, batch_shape=(len(g),))
        proof = PlonkSuccinctVerifier.read_proof(protocol, instances, td, scheme)
        accs = PlonkSuccinctVerifier.verify(
            srs.g_dev, protocol, instances, proof, scheme
        )
        flat = []
        for lhs, rhs in accs:
            for b in range(len(g)):
                flat.append((lhs[b], rhs[b]))
        group_accs.append(_fold(flat))
    return _fold(group_accs)


def tree_aggregate_sharded(snarks: Sequence, srs, mesh: Mesh,
                           scheme_name: str = "shplonk",
                           axis_name: str = "batch"):
    """Mesh version: leaves sharded over `axis_name`; layer-1 verify+fold is
    per-device, layer-2 fold is replicated after an all_gather.  Returns the
    root (lhs, rhs) plus the one-pairing decision, all inside one jit."""
    fn, args = _build_sharded(snarks, srs, mesh, scheme_name, axis_name)
    return fn(*args)


def tree_comm_inventory(snarks: Sequence, srs, mesh: Mesh,
                        scheme_name: str = "shplonk",
                        axis_name: str = "batch"):
    """MEASURED collective inventory of the sharded tree fold's layer-2
    exchange — the tree's ENTIRE collective set: layer 1 (per-device
    succinct-verify + local fold) is pure data parallelism with no
    communication, so lowering just the layer-2 program (all_gather of the
    per-device accumulators + replicated root fold) accounts every byte the
    full pipeline moves.  (Lowering the full pipeline instead is exact too,
    but rendering its StableHLO text takes tens of minutes — the verify
    graph is enormous; the collectives are identical.)"""
    from ..parallel.comm_model import collective_inventory

    ndev = mesh.shape[axis_name]

    def layer2(lhs, rhs):  # per-device shard (1, 3, 16) -> local (3, 16)
        all_lhs = jax.lax.all_gather(lhs[0], axis_name)  # (D, 3, 16)
        all_rhs = jax.lax.all_gather(rhs[0], axis_name)
        return _fold_stacked(jnp.stack([all_lhs, all_rhs], axis=1))

    fn = jax.jit(shard_map(
        layer2, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    lhs = jnp.zeros((ndev, 3, 16), jnp.uint32)
    return collective_inventory(fn, lhs, lhs, optimized=False)


def _build_sharded(snarks: Sequence, srs, mesh: Mesh,
                   scheme_name: str = "shplonk", axis_name: str = "batch"):
    protocol = snarks[0].protocol
    scheme = SCHEMES[scheme_name]
    ndev = mesh.shape[axis_name]
    B = len(snarks)
    assert B % ndev == 0

    sc, pts = _stack_streams(snarks)
    inst_cols = _stack_instances(snarks)
    flat_inst = (
        jnp.stack([v for col in inst_cols for v in col], axis=1)
        if any(protocol.num_instance)
        else jnp.zeros((B, 0, 16), jnp.uint32)
    )

    def local(sc_l, pts_l, inst_l):
        Bl = sc_l.shape[0]
        instances = []
        k = 0
        for ncol in protocol.num_instance:
            instances.append([inst_l[:, k + i, :] for i in range(ncol)])
            k += ncol
        td = PoseidonTranscript(scalars=sc_l, points=pts_l, batch_shape=(Bl,))
        proof = PlonkSuccinctVerifier.read_proof(protocol, instances, td, scheme)
        accs = PlonkSuccinctVerifier.verify(
            srs.g_dev, protocol, instances, proof, scheme
        )
        # acc-major stack, (num_accs*Bl, 2, 3, 16) — same absorb order as
        # the old per-element flatten
        pairs = jnp.concatenate(
            [jnp.stack([lhs, rhs], axis=1) for lhs, rhs in accs], axis=0
        )
        g_lhs, g_rhs = _fold_stacked(pairs)  # layer 1: this device's acc
        # layer 2: gather per-device accumulators over ICI, fold replicated
        all_lhs = jax.lax.all_gather(g_lhs, axis_name)  # (D, 3, 16)
        all_rhs = jax.lax.all_gather(g_rhs, axis_name)
        root_lhs, root_rhs = _fold_stacked(
            jnp.stack([all_lhs, all_rhs], axis=1)
        )
        ok = decide(srs, root_lhs, root_rhs)
        return root_lhs, root_rhs, ok

    # cache the jitted callable: a fresh jax.jit wrapper per call would
    # re-trace the whole two-layer graph every invocation (tens of seconds
    # of host work at batch 1024 — the same trap parallel/batch_verify.py's
    # _FN_CACHE closes)
    from ..parallel.batch_verify import _cached

    key = ("tree", protocol.content_hash(), srs.content_hash(), scheme_name,
           axis_name, mesh, sc.shape, pts.shape, flat_inst.shape)
    fn = _cached(key, lambda: jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    ), args=(sc, pts, flat_inst))
    return fn, (sc, pts, flat_inst)

"""Batch verification and accumulator aggregation — the TPU-idiomatic
replacement for the reference's AggregationCircuit pipeline.

The reference aggregates by re-verifying snarks *inside a halo2 circuit*
(/root/reference/snark-verifier-sdk/src/halo2/aggregation.rs:63-142) because
on-chain verification needs a single small proof.  On TPU the corresponding
capability is throughput: verify N proofs in one jitted batched computation,
fold their deferred-pairing accumulators with the KZG accumulation scheme
(pcs/kzg/accumulation.py), and spend ONE pairing for the whole batch.

  batch_verify   — vmap-style batched succinct-verify + per-proof decide
  aggregate      — batched succinct-verify -> KzgAs fold -> one accumulator
  aggregate_and_decide — aggregate + single pairing check

All snarks in one *batched kernel* must share a protocol (shape
specialization, mirroring how the reference monomorphizes per circuit);
`aggregate_heterogeneous` lifts that restriction at the SDK level by grouping
per protocol before the shared fold + single pairing (the reference's
zkevm+state shape, benches/zkevm_plus_state.rs).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ..ff import FR_FIELD
from ..pcs.kzg.accumulation import KzgAs
from ..pcs.kzg.decider import decide, decide_all
from ..pcs.kzg.multiopen import Bdfg21, Gwc19
from ..transcript import EvmTranscript, PoseidonTranscript
from ..verifier.plonk.verifier import PlonkSuccinctVerifier
from .snark import Snark

SCHEMES = {"shplonk": Bdfg21, "gwc": Gwc19}
TRANSCRIPTS = {"poseidon": PoseidonTranscript, "evm": EvmTranscript}


def _stack_streams(snarks: Sequence[Snark]):
    """Stack proof streams host-side (numpy), ONE device put per stream."""
    import numpy as np

    pairs = [s.host_streams() for s in snarks]
    sc = jnp.asarray(np.stack([p[0] for p in pairs], 0))  # (B, n, 16)
    pts = jnp.asarray(np.stack([p[1] for p in pairs], 0))  # (B, m, 2, 16)
    return sc, pts


def _stack_instances(snarks: Sequence[Snark]):
    """-> list (per column) of lists of (B,16) device scalars.

    Built as one host numpy block + one device put: per-value device
    dispatches through a slow device tunnel dominate batch-verify wall time
    otherwise."""
    import numpy as np

    from ..ff.spec import FR as _FR, int_to_limbs

    p, R = _FR.p, 1 << 256
    num_instance = snarks[0].protocol.num_instance
    total = sum(num_instance)
    flat = np.zeros((len(snarks), total, 16), np.uint32)
    for b, s in enumerate(snarks):
        k = 0
        for col_idx, ncol in enumerate(num_instance):
            for v_idx in range(ncol):
                flat[b, k] = int_to_limbs(
                    (s.instances[col_idx][v_idx] % p) * R % p
                )
                k += 1
    flat_dev = jnp.asarray(flat)
    out, k = [], 0
    for ncol in num_instance:
        out.append([flat_dev[:, k + i, :] for i in range(ncol)])
        k += ncol
    return out


def batch_succinct_verify(snarks: Sequence[Snark], srs, scheme_name: str = "shplonk",
                          transcript: str = "poseidon"):
    """One batched succinct verification of B same-protocol snarks.
    Returns the list of (lhs, rhs) accumulators, each (B, 3, 16).

    transcript: "poseidon" (reference PoseidonTranscript) or "evm" (keccak,
    the on-chain proof family — device keccak-f[1600] path)."""
    assert snarks
    protocol = snarks[0].protocol
    assert all(
        s.protocol.content_hash() == protocol.content_hash() for s in snarks
    ), "batched kernel requires one shared protocol; use aggregate_heterogeneous"
    scheme = SCHEMES[scheme_name]
    sc, pts = _stack_streams(snarks)
    instances = _stack_instances(snarks)
    td = TRANSCRIPTS[transcript](
        scalars=sc, points=pts, batch_shape=(len(snarks),)
    )
    proof = PlonkSuccinctVerifier.read_proof(protocol, instances, td, scheme)
    return PlonkSuccinctVerifier.verify(srs.g_dev, protocol, instances, proof, scheme)


def batch_verify(snarks: Sequence[Snark], srs, scheme_name: str = "shplonk",
                 transcript: str = "poseidon"):
    """-> (B,) bool array: per-proof full verification (succinct + decide)."""
    accs = batch_succinct_verify(snarks, srs, scheme_name, transcript)
    oks = decide_all(srs, accs)  # (num_accs, B)
    return oks.all(axis=0)


def aggregate(snarks: Sequence[Snark], srs, scheme_name: str = "shplonk"):
    """Fold all batch accumulators into one deferred pairing pair.

    The fold transcript absorbs every accumulator (per reference
    accumulation.rs:123-127) acc-major via the stacked scan-absorb path
    (O(1) graph size in the batch — pcs/kzg/accumulation.py)."""
    accs = batch_succinct_verify(snarks, srs, scheme_name)
    pairs = jnp.concatenate(
        [jnp.stack([lhs, rhs], axis=1) for lhs, rhs in accs], axis=0
    )  # (num_accs*B, 2, 3, 16)
    return KzgAs.fold_hierarchical(pairs)


def aggregate_and_decide(snarks: Sequence[Snark], srs, scheme_name: str = "shplonk"):
    import jax

    lhs, rhs = aggregate(snarks, srs, scheme_name)
    # jit the pairing: eager execution dispatches hundreds of tiny op
    # compiles, which is both slow and a reproduced XLA:CPU segfault trigger
    # (tests/conftest.py header)
    return jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs)


def _stack_instances_flat(snarks: Sequence[Snark]):
    """-> (B, total_instances, 16) device array (one put)."""
    inst_cols = _stack_instances(snarks)
    if any(snarks[0].protocol.num_instance):
        return jnp.stack([v for col in inst_cols for v in col], axis=1)
    return jnp.zeros((len(snarks), 0, 16), jnp.uint32)


_HET_CACHE: dict = {}


def aggregate_heterogeneous(snarks: Sequence[Snark], srs,
                            scheme_name: str = "shplonk"):
    """Mixed-protocol aggregation: group-by-protocol batched succinct
    verification → cross-group KzgAs fold → ONE deferred pairing pair.

    The TPU-idiomatic analogue of the reference's mixed-snark aggregation
    (/root/reference/snark-verifier-sdk/src/halo2/aggregation.rs:203-245 —
    its zkevm+state bench folds two different circuits into one accumulator,
    benches/zkevm_plus_state.rs).  Each distinct protocol compiles to its own
    shape-specialized succinct-verify program (mirroring the reference's
    per-circuit monomorphization); the accumulators all live in the same
    (G1, G1) KZG accumulator space, so the fold and final pairing are shared
    regardless of which circuit produced them.

    Accumulators enter the fold transcript in original snark order (each
    snark contributes its num_accs accumulators contiguously), so the fold
    challenge is independent of the grouping.

    The whole computation (per-group verifies + fold) runs as ONE cached
    jitted function: eager execution would dispatch thousands of tiny op
    compiles — slow, and a reproduced XLA:CPU segfault trigger
    (tests/conftest.py header).
    """
    import jax

    assert snarks
    groups: dict = {}
    for i, s in enumerate(snarks):
        groups.setdefault(s.protocol.content_hash(), []).append(i)
    group_list = [tuple(v) for v in groups.values()]
    protos = [snarks[idxs[0]].protocol for idxs in group_list]
    scheme = SCHEMES[scheme_name]

    flat_args = []
    for idxs in group_list:
        g = [snarks[i] for i in idxs]
        sc, pts = _stack_streams(g)
        flat_args += [sc, pts, _stack_instances_flat(g)]

    def build():
        def fn(*args):
            per_snark: List[List[Tuple]] = [[] for _ in snarks]
            for gi, idxs in enumerate(group_list):
                protocol = protos[gi]
                sc, pts, inst = args[3 * gi : 3 * gi + 3]
                instances, k = [], 0
                for ncol in protocol.num_instance:
                    instances.append([inst[:, k + i, :] for i in range(ncol)])
                    k += ncol
                td = PoseidonTranscript(scalars=sc, points=pts,
                                        batch_shape=(len(idxs),))
                proof = PlonkSuccinctVerifier.read_proof(
                    protocol, instances, td, scheme
                )
                accs = PlonkSuccinctVerifier.verify(
                    srs.g_dev, protocol, instances, proof, scheme
                )
                for lhs, rhs in accs:
                    for j, i in enumerate(idxs):
                        per_snark[i].append((lhs[j], rhs[j]))
            pairs = jnp.stack(
                [jnp.stack(acc, axis=0) for lst in per_snark for acc in lst],
                axis=0,
            )  # (total_accs, 2, 3, 16), original snark order
            return KzgAs.fold_hierarchical(pairs)

        return jax.jit(fn)

    key = (
        "het",
        tuple(p.content_hash() for p in protos),
        tuple(group_list),
        srs.content_hash(),
        scheme_name,
        tuple(a.shape for a in flat_args),
    )
    fn = _HET_CACHE.get(key)
    if fn is None:
        fn = build()
        _HET_CACHE[key] = fn
    return fn(*flat_args)


def aggregate_heterogeneous_and_decide(snarks: Sequence[Snark], srs,
                                       scheme_name: str = "shplonk"):
    """zkevm+state shape end-to-end: mixed protocols, one pairing check."""
    import jax

    lhs, rhs = aggregate_heterogeneous(snarks, srs, scheme_name)
    return jax.jit(lambda l, r: decide(srs, l, r))(lhs, rhs)

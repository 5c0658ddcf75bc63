"""Stacked (scan-absorb + windowed-MSM) KzgAs fold must be bit-identical to
the per-element list path — the O(1)-graph-size fold that makes the
1024-leaf tree (BASELINE config #5) compile in seconds instead of never
(pcs/kzg/accumulation.py stacked path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ec import from_affine_int, py_ec
from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.hash.poseidon import PoseidonJax, PoseidonPy
from snark_verifier_tpu.pcs.kzg.accumulation import KzgAs
from snark_verifier_tpu.transcript import PoseidonTranscript


def _rand_pairs(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = [py_ec.scalar_mul(py_ec.G1_GEN, int(rng.integers(1, 1 << 60)))
           for _ in range(2 * n)]
    dev = from_affine_int(pts)  # (2n, 3, 16) projective
    return [(dev[2 * i], dev[2 * i + 1]) for i in range(n)]


def test_sponge_scan_absorb_matches_loop():
    """update_chunks_scanned == per-chunk update, including the final
    padding permutation, against the python-int oracle."""
    rng = np.random.default_rng(1)
    vals = [int(rng.integers(1, 1 << 62)) for _ in range(10)]  # 5 chunks

    gold = PoseidonPy()
    gold.update(vals)
    want = gold.squeeze()

    F = FR_FIELD

    def run(chunks):
        h = PoseidonJax()
        h.update_chunks_scanned(chunks)
        return h.squeeze()

    chunks = F.from_int(vals).reshape(5, 2, 16)
    got = jax.jit(run)(chunks)
    assert int(F.to_int(got)) == want


@pytest.mark.parametrize("n", [1, 5])
@pytest.mark.slow
def test_stacked_fold_matches_list_fold(n):
    pairs_list = _rand_pairs(n, seed=n)
    pairs_stack = jnp.stack(
        [jnp.stack(p, axis=0) for p in pairs_list], axis=0
    )  # (n, 2, 3, 16)

    def run_list(stack):
        lst = [(stack[i, 0], stack[i, 1]) for i in range(n)]
        td = PoseidonTranscript(
            scalars=jnp.zeros((0, 16), jnp.uint32),
            points=jnp.zeros((0, 2, 16), jnp.uint32),
        )
        proof = KzgAs.read_proof(False, lst, td)
        return KzgAs.verify(lst, proof)

    def run_stacked(stack):
        td = PoseidonTranscript(
            scalars=jnp.zeros((0, 16), jnp.uint32),
            points=jnp.zeros((0, 2, 16), jnp.uint32),
        )
        proof = KzgAs.read_proof_stacked(False, stack, td)
        return KzgAs.verify_stacked(stack, proof)

    from snark_verifier_tpu.ec import to_affine_int

    l1, r1 = jax.jit(run_list)(pairs_stack)
    l2, r2 = jax.jit(run_stacked)(pairs_stack)
    # compare as curve points (projective reps may differ)
    assert to_affine_int(l1) == to_affine_int(l2)
    assert to_affine_int(r1) == to_affine_int(r2)


@pytest.mark.slow
def test_hierarchical_fold_preserves_validity():
    """fold_hierarchical (grouped-batched sponge chains, N=64 -> 8x8) of
    VALID accumulators (lhs = tau*rhs) must produce a valid accumulator;
    tampering one input must corrupt the root.  Validity is checked
    structurally (tau-multiple), which is exactly what the pairing decide
    enforces."""
    import random

    from snark_verifier_tpu.ec import to_affine_int
    from snark_verifier_tpu.ff.spec import FR

    N = 64
    tau = random.Random(5).randrange(1, FR.p)
    rng = np.random.default_rng(5)
    ks = [int(rng.integers(1, 1 << 60)) for _ in range(N)]
    rhs = [py_ec.scalar_mul(py_ec.G1_GEN, k) for k in ks]
    lhs = [py_ec.scalar_mul(py_ec.G1_GEN, k * tau % FR.p) for k in ks]
    lhs_dev = from_affine_int(lhs)  # (N, 3, 16)
    rhs_dev = from_affine_int(rhs)
    pairs = jnp.stack([lhs_dev, rhs_dev], axis=1)  # (N, 2, 3, 16)

    fold = jax.jit(KzgAs.fold_hierarchical)
    fl, fr = fold(pairs)
    fl_a, fr_a = to_affine_int(fl), to_affine_int(fr)
    # root must satisfy lhs == tau * rhs
    assert fl_a == py_ec.scalar_mul(fr_a, tau)

    bad = pairs.at[3, 0].set(from_affine_int([py_ec.G1_GEN])[0])
    bl, br = fold(bad)
    assert to_affine_int(bl) != py_ec.scalar_mul(to_affine_int(br), tau)

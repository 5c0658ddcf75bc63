"""Device keccak-f[1600] + device EvmTranscript: bit-exactness vs the host
oracle and the full on-chain-family (keccak transcript) proof path through
the batched device verifier (reference transcript/evm.rs:78-105,163-244)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ff import FR_FIELD
from snark_verifier_tpu.ff.spec import FR
from snark_verifier_tpu.hash.keccak import _keccak_f, keccak256
from snark_verifier_tpu.hash.keccak_device import (
    keccak_f,
    keccak256_words,
    lanes_to_limbs,
    limbs_to_lanes,
)
from snark_verifier_tpu.sdk.aggregation import batch_verify
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, prove
from snark_verifier_tpu.transcript import EvmTranscript, EvmTranscriptPy
from snark_verifier_tpu.verifier.plonk.verifier import verify_snark_native


def _word_lanes(v: int):
    limbs = np.array([(v >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
    return limbs_to_lanes(jnp.asarray(limbs))


def _lanes_int(h) -> int:
    limbs = np.asarray(lanes_to_limbs(jnp.asarray(h)))
    return sum(int(l) << (16 * i) for i, l in enumerate(limbs))


def test_keccak_f_matches_host():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 64, size=25, dtype=np.uint64)
    host = [[int(vals[x + 5 * y]) for y in range(5)] for x in range(5)]
    want = _keccak_f([row[:] for row in host])
    st = np.stack(
        [(vals & 0xFFFFFFFF).astype(np.uint32),
         (vals >> np.uint64(32)).astype(np.uint32)], -1
    )
    got = np.asarray(jax.jit(keccak_f)(jnp.asarray(st)))
    got64 = got[:, 0].astype(np.uint64) | (got[:, 1].astype(np.uint64) << np.uint64(32))
    want_flat = np.array(
        [want[x][y] for y in range(5) for x in range(5)], dtype=np.uint64
    )
    assert np.array_equal(got64, want_flat)


@pytest.mark.parametrize("W", [2, 4, 5, 9])
def test_keccak256_words_matches_host(W):
    rng = np.random.default_rng(W)
    vs = [int.from_bytes(rng.bytes(32), "big") for _ in range(W)]
    want = keccak256(b"".join(v.to_bytes(32, "big") for v in vs))
    h = jax.jit(lambda ws: keccak256_words(ws))([_word_lanes(v) for v in vs])
    assert _lanes_int(h) == int.from_bytes(want, "big")


def test_keccak256_single_word_dup_marker():
    """Buffer == one hash word => the transcript appends 0x01 (evm.rs:88)."""
    v = int.from_bytes(np.random.default_rng(7).bytes(32), "big")
    want = keccak256(v.to_bytes(32, "big") + b"\x01")
    h = jax.jit(lambda w: keccak256_words([w]))(_word_lanes(v))
    assert _lanes_int(h) == int.from_bytes(want, "big")


def test_device_transcript_matches_host_oracle():
    """Random absorb/squeeze pattern, batch of 2: device challenges must
    equal the python-int oracle's, element-wise."""
    rng = np.random.default_rng(3)
    from snark_verifier_tpu.ec import py_ec

    B = 2
    scal = [[rng.integers(1, 2**60) * 7 + b for b in range(B)] for _ in range(3)]
    pts_int = [py_ec.scalar_mul(py_ec.G1_GEN, int(k) + 1) for k in range(B)]

    hosts = [EvmTranscriptPy() for _ in range(B)]
    for b in range(B):
        hosts[b].common_scalar(int(scal[0][b]))
        hosts[b].common_ec_point(pts_int[b])
        hosts[b].common_scalar(int(scal[1][b]))
    want1 = [h.squeeze_challenge() for h in hosts]
    for b in range(B):
        hosts[b].common_scalar(int(scal[2][b]))
    want2 = [h.squeeze_challenge() for h in hosts]
    want3 = [h.squeeze_challenge() for h in hosts]  # dup-marker squeeze

    from snark_verifier_tpu.ec import from_affine_int

    def run(s0, s1, s2, pts):
        t = EvmTranscript(batch_shape=(B,))
        t.common_scalar(s0)
        t.common_ec_point(pts)
        t.common_scalar(s1)
        c1 = t.squeeze_challenge()
        t.common_scalar(s2)
        c2 = t.squeeze_challenge()
        c3 = t.squeeze_challenge()
        return c1, c2, c3

    dev = jax.jit(run)(
        FR_FIELD.from_int([int(v) for v in scal[0]]),
        FR_FIELD.from_int([int(v) for v in scal[1]]),
        FR_FIELD.from_int([int(v) for v in scal[2]]),
        from_affine_int(pts_int)[:, :2, :],
    )
    for got, want in zip(dev, (want1, want2, want3)):
        assert list(FR_FIELD.to_int(got)) == want


@pytest.fixture(scope="module")
def evm_snarks():
    srs = toy_srs(32)
    base = StandardPlonk.rand(k=3, seed=11)
    protocol = build_protocol(base, srs)
    snarks = []
    for i in range(2):
        c = StandardPlonk.rand(k=3, seed=11).set_instance(
            [(base.instance[0] + 5 * i) % FR.p]
        )
        scalars, points = prove(c, protocol, srs, scheme="shplonk",
                                transcript=EvmTranscriptPy())
        snarks.append(Snark(protocol, [list(c.instance)], scalars, points))
    return srs, protocol, snarks


def test_native_verify_evm_transcript(evm_snarks):
    srs, protocol, snarks = evm_snarks
    assert verify_snark_native(snarks[0], srs, "shplonk", transcript="evm")
    # a Poseidon-transcript read of a keccak proof must NOT verify
    assert not verify_snark_native(snarks[0], srs, "shplonk",
                                   transcript="poseidon")


@pytest.mark.slow
def test_device_batch_verify_evm_transcript(evm_snarks):
    """The headline capability: keccak-transcript proofs through the same
    batched jitted verify path as Poseidon ones, accept + tamper lanes."""
    srs, protocol, snarks = evm_snarks
    bad = Snark(protocol, [[(snarks[1].instances[0][0] + 1) % FR.p]],
                snarks[1].scalars, snarks[1].points)
    oks = batch_verify([snarks[0], snarks[1], bad, snarks[0]], srs,
                       "shplonk", transcript="evm")
    assert [bool(v) for v in oks] == [True, True, False, True]

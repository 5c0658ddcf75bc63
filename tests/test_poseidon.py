"""Poseidon KATs — the bit-exactness anchor for the transcript (SURVEY.md §4:
reference tests poseidon/tests.rs check the hadeshash x5_254_3 and x5_254_5
vectors and the generated MDS matrix)."""

import jax.numpy as jnp
import pytest

from snark_verifier_tpu.ff import FR, FR_FIELD
from snark_verifier_tpu.hash.grain import generate_constants
from snark_verifier_tpu.hash.poseidon import PoseidonJax, PoseidonPy, permute

# reference /root/reference/snark-verifier/src/util/hash/poseidon/tests.rs:10-26
MDS_X5_254_3 = [
    [
        7511745149465107256748700652201246547602992235352608707588321460060273774987,
        10370080108974718697676803824769673834027675643658433702224577712625900127200,
        19705173408229649878903981084052839426532978878058043055305024233888854471533,
    ],
    [
        18732019378264290557468133440468564866454307626475683536618613112504878618481,
        20870176810702568768751421378473869562658540583882454726129544628203806653987,
        7266061498423634438633389053804536045105766754026813321943009179476902321146,
    ],
    [
        9131299761947733513298312097611845208338517739621853568979632113419485819303,
        10595341252162738537912664445405114076324478519622938027420701542910180337937,
        11597556804922396090267472882856054602429588299176362916247939723151043581408,
    ],
]

# hadeshash test vectors (reference poseidon/tests.rs:50-54, 74-80)
PERM_X5_254_3 = [
    7853200120776062878684798364095072458815029376092732009249414926327459813530,
    7142104613055408817911962100316808866448378443474503659992478482890339429929,
    6549537674122432311777789598043107870002137484850126429160507761192163713804,
]
PERM_X5_254_5 = [
    18821383157269793795438455681495246036402687001665670618754263018637548127333,
    7817711165059374331357136443537800893307845083525445872661165200086166013245,
    16733335996448830230979566039396561240864200624113062088822991822580465420551,
    6644334865470350789317807668685953492649391266180911382577082600917830417726,
    3372108894677221197912083238087960099443657816445944159266857514496320565191,
]


def test_mds_kat():
    _, mds = generate_constants(FR.p, 254, 3, 8, 57)
    assert mds == MDS_X5_254_3


def test_permutation_kat_t3_py():
    h = PoseidonPy(t=3, rate=2, r_f=8, r_p=57)
    h.state = [0, 1, 2]
    h.permutation([0, 0])
    assert h.state == PERM_X5_254_3


def test_permutation_kat_t5_py():
    h = PoseidonPy(t=5, rate=4, r_f=8, r_p=60)
    h.state = [0, 1, 2, 3, 4]
    h.permutation([0, 0, 0, 0])
    assert h.state == PERM_X5_254_5


def test_permutation_kat_t3_device():
    F = FR_FIELD
    state = jnp.stack([F.from_int(0), F.from_int(1), F.from_int(2)], 0)
    out = permute(state)
    assert [int(v) for v in F.to_int(out)] == PERM_X5_254_3


def test_device_permutation_batched():
    F = FR_FIELD
    one = jnp.stack([F.from_int(0), F.from_int(1), F.from_int(2)], 0)
    batch = jnp.stack([one, one], 0)  # (2, 3, 16)
    out = permute(batch)
    vals = F.to_int(out)
    for b in range(2):
        assert [int(v) for v in vals[b]] == PERM_X5_254_3


@pytest.mark.parametrize("nabsorb", [0, 1, 2, 3, 4, 5])
def test_sponge_device_matches_oracle(nabsorb):
    F = FR_FIELD
    vals = [(i * 7919 + 3) % FR.p for i in range(nabsorb)]
    py = PoseidonPy()
    py.update(vals)
    want = py.squeeze()
    # second squeeze with empty buffer exercises the exact-multiple path
    want2 = py.squeeze()

    dj = PoseidonJax()
    dj.update([F.from_int(v) for v in vals])
    got = int(F.to_int(dj.squeeze()))
    got2 = int(F.to_int(dj.squeeze()))
    assert (got, got2) == (want, want2)


def test_sponge_multi_chunk_and_interleave():
    F = FR_FIELD
    py = PoseidonPy()
    dj = PoseidonJax()
    seq1 = [5, 6, 7]
    seq2 = [8]
    py.update(seq1)
    a1 = py.squeeze()
    py.update(seq2)
    a2 = py.squeeze()
    dj.update([F.from_int(v) for v in seq1])
    b1 = int(F.to_int(dj.squeeze()))
    dj.update([F.from_int(v) for v in seq2])
    b2 = int(F.to_int(dj.squeeze()))
    assert (a1, a2) == (b1, b2)

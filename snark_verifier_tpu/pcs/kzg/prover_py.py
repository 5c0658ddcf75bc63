"""Host-side KZG multi-open provers (python ints) for GWC19 and BDFG21.

These play the role halo2_proofs' provers play for the reference (the
reference only verifies; its SDK calls halo2's prover —
/root/reference/snark-verifier-sdk/src/halo2.rs:77-146).  Here they generate
test/bench workloads and power the aggregation pipeline's proof generation.

Transcript discipline matches the device verifiers exactly: the caller
absorbs commitments/evals upstream; these functions then produce the PCS
proof stream (challenges interleaved in the same order the verifiers expect).
"""

from __future__ import annotations

import random
from typing import Dict, List, Sequence, Tuple

from ...ff.spec import FR
from ...utils import py_poly as pp
from .multiopen import Query, bdfg_query_sets, gwc_query_sets

R = FR.p


def gwc_open(srs, polys: List[List[int]], queries: List[Query], z: int, transcript):
    """GWC19 prover.  queries' evals are ints (already absorbed upstream)."""
    v = transcript.squeeze_challenge()
    sets = gwc_query_sets(queries)
    for shift, set_polys, _ in sets:
        z_s = z * shift % R
        h: List[int] = []
        pv = 1
        for poly_idx in set_polys:
            f = polys[poly_idx]
            fz = pp.peval(f, z_s)
            quot = pp.pdiv_linear(pp.psub(f, [fz]), z_s)
            h = pp.padd(h, pp.pscale(quot, pv))
            pv = pv * v % R
        transcript.write_ec_point(srs.commit(h))
    transcript.squeeze_challenge()  # u — verifier-side only


def shplonk_open(srs, polys: List[List[int]], queries: List[Query], z: int, transcript):
    """BDFG21 (SHPLONK) prover."""
    mu = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()
    sets = bdfg_query_sets(queries)

    # r_{s,i}(X): interpolation of (z·shift_j, eval_ij); Z_s(X) = Π (X − z·s_j)
    set_rs: List[List[List[int]]] = []
    set_zs: List[List[int]] = []
    h: List[int] = []
    pg = 1
    for shifts, set_polys, set_evals in sets:
        pts_x = [z * sh % R for sh in shifts]
        z_s_poly = pp.vanishing(pts_x)
        rs = []
        pm = 1
        inner: List[int] = []
        for poly_idx, evals in zip(set_polys, set_evals):
            f = polys[poly_idx]
            r_poly = pp.lagrange_interpolate(list(zip(pts_x, evals)))
            rs.append(r_poly)
            inner = pp.padd(inner, pp.pscale(pp.psub(f, r_poly), pm))
            pm = pm * mu % R
        quot, rem = pp.pdivmod(inner, z_s_poly)
        assert not rem, "query evals inconsistent with polys"
        h = pp.padd(h, pp.pscale(quot, pg))
        set_rs.append(rs)
        set_zs.append(z_s_poly)
        pg = pg * gamma % R
    w = srs.commit(h)
    transcript.write_ec_point(w)
    z_prime = transcript.squeeze_challenge()

    # L(X) = Σₛ γˢ (Z_{s₁}(z')/Z_s(z')) Σᵢ μⁱ (fᵢ(X) − r_{s,i}(z')) − Z_{s₁}(z')·h(X)
    zs1_at = pp.peval(set_zs[0], z_prime)
    L: List[int] = []
    pg = 1
    for (shifts, set_polys, _), rs, z_s_poly in zip(sets, set_rs, set_zs):
        factor = zs1_at * pow(pp.peval(z_s_poly, z_prime), -1, R) % R
        pm = 1
        inner = []
        for poly_idx, r_poly in zip(set_polys, rs):
            f = polys[poly_idx]
            inner = pp.padd(inner, pp.pscale(pp.psub(f, [pp.peval(r_poly, z_prime)]), pm))
            pm = pm * mu % R
        L = pp.padd(L, pp.pscale(inner, pg * factor % R))
        pg = pg * gamma % R
    L = pp.psub(L, pp.pscale(h, zs1_at))
    w_prime_poly = pp.pdiv_linear(L, z_prime)
    transcript.write_ec_point(srs.commit(w_prime_poly))

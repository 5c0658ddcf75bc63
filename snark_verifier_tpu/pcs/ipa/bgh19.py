"""BGH19 multi-open for the IPA PCS (reference parity:
/root/reference/snark-verifier/src/pcs/ipa/multiopen/bgh19.rs — the
halo2_proofs IPA multiopen, https://eprint.iacr.org/2019/1021).

Verifier math follows the reference exactly: group queries into shift-sets,
barycentric per-set coefficients with the two-phase batched inversion
(bgh19.rs:205-231, 289-345), then one IPA succinct check that the x_4-
combination evaluates to 0 at x_3 (bgh19.rs:56-95).

Deviations by design (as for pcs/ipa/ipa.py): BN254 + Poseidon transcript,
and the proof wire order for the trailing IPA is this framework's
Ipa.create_proof order (the byte format already differs via the hash).
The host prover here is a direct construction from the verification
identity: q_i = Σ x_1^t p_t, r_i = interpolation of q_i on the set's
points, f = Σ x_2^i (q_i - r_i)/Π(X - z_ij).
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax.numpy as jnp

from ...ff import FR_FIELD
from ...ff.spec import FR as FR_SPEC
from ...loader.msm_expr import MsmExpr
from ...utils import py_poly
from ..kzg.multiopen import Query, bdfg_query_sets, powers
from .ipa import Ipa, IpaProvingKey, _from_affine_const

FR = FR_FIELD
R_MOD = FR_SPEC.p

# The shift-set grouping is identical to SHPLONK's (kzg/multiopen.py
# bdfg_query_sets mirrors bgh19.rs:159-202).
query_sets = bdfg_query_sets


class Bgh19:
    """Multi-open verifier (device) + prover (host) for IpaAs<_, Bgh19>."""

    # ---------------------------------------------------------------- prover

    @staticmethod
    def open(pk: IpaProvingKey, polys: List[List[int]], queries: List[Query],
             x: int, transcript, seed: int = 7):
        """Host prover.  queries carry host-int evals; shifts are host ints.
        Writes the multiopen proof + trailing IPA to `transcript`."""
        sets = bdfg_query_sets(queries)
        x_1 = transcript.squeeze_challenge()
        x_2 = transcript.squeeze_challenge()

        # q_i(X) = Σ_t x_1^t · p_{i, rev(t)}   (bgh19.rs msm() reverses)
        qs = []
        for shifts, pids, _evals in sets:
            q = [0]
            pw = 1
            for pid in reversed(pids):
                q = py_poly.padd(q, py_poly.pscale(polys[pid], pw))
                pw = pw * x_1 % R_MOD
            qs.append(q)

        # f(X) = Σ_i x_2^i · (q_{n-1-i} - r_{n-1-i}) / Π_j (X - z_ij)
        f_poly = [0]
        pw = 1
        for i in range(len(sets) - 1, -1, -1):
            shifts = sets[i][0]
            q = qs[i]
            zs = [sh * x % R_MOD for sh in shifts]
            pts = [(z, py_poly.peval(q, z)) for z in zs]
            r = py_poly.lagrange_interpolate(pts)
            num = py_poly.psub(q, r)
            for z in zs:
                num = py_poly.pdiv_linear(num, z)
            f_poly = py_poly.padd(f_poly, py_poly.pscale(num, pw))
            pw = pw * x_2 % R_MOD

        f_commit = pk.commit(f_poly)
        transcript.write_ec_point(f_commit)
        x_3 = transcript.squeeze_challenge()
        q_evals = [py_poly.peval(q, x_3) for q in qs]
        for qe in q_evals:
            transcript.write_scalar(qe)
        x_4 = transcript.squeeze_challenge()

        # final poly: x_4^n (f - f(x_3)) + Σ_i x_4^{n-1-i} (q_i - q_i(x_3));
        # constants are coefficient-0 adjustments (G_0 is the constant basis)
        n_sets = len(sets)
        final = [0]
        items = [(f_poly, py_poly.peval(f_poly, x_3))] + list(zip(qs, q_evals))
        for (poly, ev), k in zip(items, range(n_sets, -1, -1)):
            pw4 = pow(x_4, k, R_MOD)
            adj = list(poly) or [0]
            adj[0] = (adj[0] - ev) % R_MOD
            final = py_poly.padd(final, py_poly.pscale(adj, pw4))
        return Ipa.create_proof(pk, final, x_3, None, transcript, seed=seed)

    # -------------------------------------------------------------- verifier

    @staticmethod
    def read_proof(svk, queries: List[Query], transcript) -> dict:
        proof = {}
        proof["x_1"] = transcript.squeeze_challenge()
        proof["x_2"] = transcript.squeeze_challenge()
        proof["f"] = transcript.read_ec_point()
        proof["x_3"] = transcript.squeeze_challenge()
        proof["q_evals"] = transcript.read_n_scalars(len(bdfg_query_sets(queries)))
        proof["x_4"] = transcript.squeeze_challenge()
        proof["ipa"] = Ipa.read_proof(svk, transcript)
        return proof

    @staticmethod
    def verify(svk, commitments: List[MsmExpr], x, queries: List[Query], proof):
        """Device verify: returns (IpaAccumulator, ok).  `x` is the opening
        point (device scalar); query shifts are host ints."""
        sets = bdfg_query_sets(queries)
        x_3 = proof["x_3"]

        # ---- per-set coefficients (two-phase batched inversion)
        max_k = max(max(len(s[0]) for s in sets), 2)
        pow_x = powers(x, max_k)
        shift_superset = sorted({sh for s in sets for sh in s[0]})
        x3_minus = {
            sh: FR.sub(x_3, FR.mul(FR.from_int(sh), x)) for sh in shift_superset
        }

        set_data = []
        for shifts, pids, evals in sets:
            k = len(shifts)
            nell = []
            for j, sj in enumerate(shifts):
                acc = 1
                for i2, si in enumerate(shifts):
                    if i2 != j:
                        acc = acc * (sj - si) % R_MOD
                nell.append(acc)
            xk1 = pow_x[k - 1]
            denoms = [
                FR.add(
                    FR.mul(FR.mul(FR.from_int(nell[j]), xk1), x_3),
                    FR.neg(FR.mul(FR.mul(FR.from_int(nell[j] * shifts[j] % R_MOD), xk1), x)),
                )
                for j in range(k)
            ]
            fden = x3_minus[shifts[0]]
            for sh in shifts[1:]:
                fden = FR.mul(fden, x3_minus[sh])
            set_data.append({"shifts": shifts, "pids": pids, "evals": evals,
                             "denoms": denoms, "fden": fden})

        flat = []
        for sd in set_data:
            flat.extend(sd["denoms"])
            flat.append(sd["fden"])
        inv_flat = list(FR.batch_inv(jnp.stack(flat, 0)))
        i = 0
        for sd in set_data:
            k = len(sd["denoms"])
            sd["weights"] = inv_flat[i : i + k]
            i += k
            sd["f_coeff"] = inv_flat[i]
            i += 1
        sums = []
        for sd in set_data:
            acc = sd["weights"][0]
            for w in sd["weights"][1:]:
                acc = FR.add(acc, w)
            sums.append(acc)
        inv_sums = list(FR.batch_inv(jnp.stack(sums, 0)))
        for sd, inv_sum in zip(set_data, inv_sums):
            sd["r_coeff"] = inv_sum

        # ---- f_eval = Σ_i x_2^i · f_evals[rev i]
        max_polys = max(len(sd["pids"]) for sd in set_data)
        pow_x1 = powers(proof["x_1"], max_polys)
        pow_x2 = powers(proof["x_2"], len(set_data))

        f_evals = []
        for sd, q_eval in zip(set_data, proof["q_evals"]):
            r_evals = []
            for evs in sd["evals"]:
                acc = FR.mul(sd["weights"][0], evs[0])
                for w, ev in zip(sd["weights"][1:], evs[1:]):
                    acc = FR.add(acc, FR.mul(w, ev))
                r_evals.append(FR.mul(acc, sd["r_coeff"]))
            r_eval = None
            for rv, p1 in zip(reversed(r_evals), pow_x1):
                term = FR.mul(rv, p1)
                r_eval = term if r_eval is None else FR.add(r_eval, term)
            f_evals.append(FR.mul(FR.sub(q_eval, r_eval), sd["f_coeff"]))
        f_eval = None
        for p2, fe in zip(pow_x2, reversed(f_evals)):
            term = FR.mul(p2, fe)
            f_eval = term if f_eval is None else FR.add(f_eval, term)

        # ---- combined commitment P (constants fold onto the G_0 basis)
        items = [MsmExpr.base(_affine_to_proj(proof["f"])) - MsmExpr.constant(f_eval)]
        for sd, q_eval in zip(set_data, proof["q_evals"]):
            msm = MsmExpr()
            for pid, p1 in zip(reversed(sd["pids"]), pow_x1):
                msm = msm + commitments[pid] * p1
            items.append(msm - MsmExpr.constant(q_eval))
        pow_x4 = powers(proof["x_4"], len(items))
        p = MsmExpr.sum([it * p4 for it, p4 in zip(items, reversed(pow_x4))])
        bases_only, const = p.split()
        if const is not None:
            bases_only = bases_only + MsmExpr.base(_from_affine_const(svk.g0)) * const

        zero = jnp.broadcast_to(FR.zero, x_3.shape)
        return Ipa.succinct_verify(svk, bases_only, x_3, zero, proof["ipa"])


def _affine_to_proj(xy):
    from .ipa import _affine_to_proj as f

    return f(xy)

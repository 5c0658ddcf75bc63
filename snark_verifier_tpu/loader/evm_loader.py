"""EVM codegen loader: running the generic verifier under this loader emits a
Yul verifier contract.

TPU-native framing: the TPU has no on-chain meaning, but the reference's
second headline capability — generate a standalone EVM verifier for any
compiled protocol (/root/reference/snark-verifier/src/loader/evm/loader.rs) —
is host-side code generation, so it lives here unchanged in spirit: the SAME
generic verifier (verifier/plonk/verifier.py) runs once at "trace time" with
this loader and every scalar/EC op becomes a Yul statement, exactly like the
device loader turns them into XLA ops.

Behavioral parity notes (re-derived, not transliterated):
  * lazy scalar values Constant/Memory/Negated/Sum/Product with
    materialize-on-build caching   (loader.rs:24-48, :223-237)
  * calldata loads with on-curve validation (code.rs:41-55, loader.rs:143-175)
  * EC arithmetic via precompiles 0x6/0x7, modexp inversion via 0x5, pairing
    via 0x8 (loader.rs:296-335, :308-321, :338-373)
  * MSM lowered to an ecMul/ecAdd chain (loader.rs:655-667)
  * keccak transcript: squeeze hashes the contiguous memory window holding
    everything absorbed since the last squeeze; the buffer restarts with a
    duplicate of the hash (system/halo2/transcript/evm.rs:78-105)
  * accumulator limb decoding with shl-composition + validation
    (pcs/kzg/accumulator.rs:97-124)
  * multi-accumulator decide: keccak-RLC fold to one pairing
    (pcs/kzg/decider.rs:111-170)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..ff.spec import FQ, FR

Q = FQ.p
R = FR.p


def _hx(v: int) -> str:
    return hex(v)


class EvmScalar:
    """Lazy Fr value: ('const', v) | ('mem', ptr) | ('neg', x) |
    ('sum', a, b) | ('prod', a, b)."""

    __slots__ = ("loader", "value")

    def __init__(self, loader: "EvmLoader", value: Tuple):
        self.loader = loader
        self.value = value

    def ident(self) -> str:
        t = self.value[0]
        if t in ("const", "mem"):
            return f"{t}:{self.value[1]}"
        if t == "neg":
            return f"-({self.value[1].ident()})"
        a, b = self.value[1], self.value[2]
        op = "+" if t == "sum" else "*"
        return f"({a.ident()} {op} {b.ident()})"

    def is_const(self) -> bool:
        return self.value[0] == "const"


class EvmEcPoint:
    """('const', (x, y)) | ('mem', ptr); memory layout is x at ptr,
    y at ptr+0x20."""

    __slots__ = ("loader", "value")

    def __init__(self, loader: "EvmLoader", value: Tuple):
        self.loader = loader
        self.value = value

    def ptr(self) -> int:
        assert self.value[0] == "mem"
        return self.value[1]


class EvmLoader:
    """Loader-interface implementation that emits Yul."""

    name = "evm"

    def __init__(self):
        self.stmts: List[str] = []
        self._ptr = 0
        self._cache: Dict[str, int] = {}

    # --------------------------------------------------------- codegen core

    def emit(self, code: str):
        self.stmts.append(code)

    def allocate(self, size: int) -> int:
        ptr = self._ptr
        self._ptr += size
        return ptr

    def _push(self, s: EvmScalar) -> str:
        """Yul expression string for a scalar value."""
        t = s.value[0]
        if t == "const":
            return str(s.value[1])
        if t == "mem":
            return f"mload({_hx(s.value[1])})"
        if t == "neg":
            return f"sub(f_q, {self._push(s.value[1])})"
        a = self._push(s.value[1])
        b = self._push(s.value[2])
        op = "addmod" if t == "sum" else "mulmod"
        return f"{op}({a}, {b}, f_q)"

    def scalar_value(self, value: Tuple) -> EvmScalar:
        """Wrap a value; Sum/Product are materialized to memory (cached by
        structural identity) so expressions never deepen (loader.rs:223-237)."""
        if value[0] in ("const", "mem", "neg"):
            return EvmScalar(self, value)
        s = EvmScalar(self, value)
        ident = s.ident()
        ptr = self._cache.get(ident)
        if ptr is None:
            expr = self._push(s)
            ptr = self.allocate(0x20)
            self.emit(f"mstore({_hx(ptr)}, {expr})")
            self._cache[ident] = ptr
        return EvmScalar(self, ("mem", ptr))

    # ------------------------------------------------- loader scalar algebra

    def scalar(self, v: int) -> EvmScalar:
        return EvmScalar(self, ("const", v % R))

    def add(self, a: EvmScalar, b: EvmScalar) -> EvmScalar:
        if a.is_const() and b.is_const():
            return self.scalar(a.value[1] + b.value[1])
        return self.scalar_value(("sum", a, b))

    def sub(self, a: EvmScalar, b: EvmScalar) -> EvmScalar:
        return self.add(a, self.neg(b))

    def mul(self, a: EvmScalar, b: EvmScalar) -> EvmScalar:
        if a.is_const() and b.is_const():
            return self.scalar(a.value[1] * b.value[1])
        return self.scalar_value(("prod", a, b))

    def neg(self, a: EvmScalar) -> EvmScalar:
        if a.is_const():
            return self.scalar(-a.value[1])
        if a.value[0] == "neg":
            return a.value[1]
        return EvmScalar(self, ("neg", a))

    def invert(self, a: EvmScalar) -> EvmScalar:
        """Fr inversion via the modexp precompile (loader.rs:308-321)."""
        rd_ptr = self.allocate(0x20)
        args = [
            self.scalar(0x20),
            self.scalar(0x20),
            self.scalar(0x20),
            a,
            self.scalar(R - 2),
            EvmScalar(self, ("const", R)),  # modulus, unreduced
        ]
        cd_ptr = None
        for s in args:
            ptr = self.allocate(0x20)
            if cd_ptr is None:
                cd_ptr = ptr
            expr = str(s.value[1]) if s.is_const() else self._push(s)
            self.emit(f"mstore({_hx(ptr)}, {expr})")
        self.staticcall(0x05, cd_ptr, 0xC0, rd_ptr, 0x20)
        return EvmScalar(self, ("mem", rd_ptr))

    def batch_inv(self, xs: List[EvmScalar]) -> List[EvmScalar]:
        """Montgomery trick with ONE modexp (the reference ScalarLoader
        batch_invert default, loader.rs:241-248) — gas: 1 modexp + 3(n-1)
        mulmods instead of n modexps."""
        if not xs:
            return []
        if len(xs) == 1:
            return [self.invert(xs[0])]
        prefix = [xs[0]]
        for x in xs[1:]:
            prefix.append(self.mul(prefix[-1], x))
        inv_all = self.invert(prefix[-1])
        out: List[Optional[EvmScalar]] = [None] * len(xs)
        for i in range(len(xs) - 1, 0, -1):
            out[i] = self.mul(inv_all, prefix[i - 1])
            inv_all = self.mul(inv_all, xs[i])
        out[0] = inv_all
        return out  # type: ignore[return-value]

    def pow_static(self, a: EvmScalar, n: int) -> EvmScalar:
        assert n >= 1
        bits = bin(n)[2:]
        acc = a
        for b in bits[1:]:
            acc = self.mul(acc, acc)
            if b == "1":
                acc = self.mul(acc, a)
        return acc

    def powers(self, x: EvmScalar, n: int) -> List[EvmScalar]:
        out = [self.scalar(1)]
        for _ in range(n - 1):
            out.append(self.mul(out[-1], x))
        return out

    # ----------------------------------------------------------- points/MSM

    def ec_point_const(self, xy: Tuple[int, int]) -> EvmEcPoint:
        return EvmEcPoint(self, ("const", xy))

    def dup_ec_point(self, p: EvmEcPoint) -> EvmEcPoint:
        ptr = self.allocate(0x40)
        if p.value[0] == "const":
            x, y = p.value[1]
            self.emit(f"mstore({_hx(ptr)}, {_hx(x)})")
            self.emit(f"mstore({_hx(ptr + 0x20)}, {_hx(y)})")
        else:
            src = p.value[1]
            self.emit(f"mstore({_hx(ptr)}, mload({_hx(src)}))")
            self.emit(f"mstore({_hx(ptr + 0x20)}, mload({_hx(src + 0x20)}))")
        return EvmEcPoint(self, ("mem", ptr))

    def staticcall(self, addr: int, cd_ptr: int, cd_len: int, rd_ptr: int,
                   rd_len: int):
        self.emit(
            f"success := and(eq(staticcall(gas(), {_hx(addr)}, {_hx(cd_ptr)}, "
            f"{_hx(cd_len)}, {_hx(rd_ptr)}, {_hx(rd_len)}), 1), success)"
        )

    def ec_add(self, a: EvmEcPoint, b: EvmEcPoint) -> EvmEcPoint:
        rd = self.dup_ec_point(a).ptr()
        self.dup_ec_point(b)
        self.staticcall(0x06, rd, 0x80, rd, 0x40)
        return EvmEcPoint(self, ("mem", rd))

    def ec_mul(self, p: EvmEcPoint, s: EvmScalar) -> EvmEcPoint:
        rd = self.dup_ec_point(p).ptr()
        ptr = self.allocate(0x20)
        expr = str(s.value[1]) if s.is_const() else self._push(s)
        self.emit(f"mstore({_hx(ptr)}, {expr})")
        self.staticcall(0x07, rd, 0x60, rd, 0x40)
        return EvmEcPoint(self, ("mem", rd))

    def calldataload_scalar(self, offset: int) -> EvmScalar:
        ptr = self.allocate(0x20)
        self.emit(f"mstore({_hx(ptr)}, mod(calldataload({_hx(offset)}), f_q))")
        return EvmScalar(self, ("mem", ptr))

    def calldataload_ec_point(self, offset: int) -> EvmEcPoint:
        ptr = self.allocate(0x40)
        self.emit(
            "{\n"
            f"    let x := calldataload({_hx(offset)})\n"
            f"    mstore({_hx(ptr)}, x)\n"
            f"    let y := calldataload({_hx(offset + 0x20)})\n"
            f"    mstore({_hx(ptr + 0x20)}, y)\n"
            "    success := and(validate_ec_point(x, y), success)\n"
            "}"
        )
        return EvmEcPoint(self, ("mem", ptr))

    def ec_point_from_limbs(self, x_limbs: List[EvmScalar],
                            y_limbs: List[EvmScalar], bits: int) -> EvmEcPoint:
        """Compose x/y from instance limbs and validate
        (accumulator.rs:97-124)."""
        ptr = self.allocate(0x40)
        lines = ["{"]
        for name, limbs, at in (("x", x_limbs, ptr), ("y", y_limbs, ptr + 0x20)):
            for idx, limb in enumerate(limbs):
                e = self._push(limb)
                if idx == 0:
                    lines.append(f"    let {name} := {e}")
                else:
                    lines.append(f"    {name} := add({name}, shl({idx * bits}, {e}))")
            lines.append(f"    mstore({_hx(at)}, {name})")
        lines.append("    success := and(validate_ec_point(x, y), success)")
        lines.append("}")
        self.emit("\n".join(lines))
        return EvmEcPoint(self, ("mem", ptr))

    def keccak256(self, ptr: int, length: int) -> int:
        hash_ptr = self.allocate(0x20)
        self.emit(f"mstore({_hx(hash_ptr)}, keccak256({_hx(ptr)}, {length}))")
        return hash_ptr

    def pairing(self, lhs: EvmEcPoint, g2: Tuple[int, int, int, int],
                rhs: EvmEcPoint, minus_s_g2: Tuple[int, int, int, int]):
        """e(lhs, g2)·e(rhs, −s_g2) == 1 via precompile 0x8
        (loader.rs:338-373)."""
        rd = self.dup_ec_point(lhs).ptr()
        self.allocate(0x80)
        for i, w in enumerate(g2):
            self.emit(f"mstore({_hx(rd + 0x40 + 0x20 * i)}, {_hx(w)})")
        self.dup_ec_point(rhs)
        self.allocate(0x80)
        for i, w in enumerate(minus_s_g2):
            self.emit(f"mstore({_hx(rd + 0x100 + 0x20 * i)}, {_hx(w)})")
        self.staticcall(0x08, rd, 0x180, rd, 0x20)
        self.emit(f"success := and(eq(mload({_hx(rd)}), 1), success)")

    # ------------------------------------------------------- MSM expression

    def msm_zero(self) -> "EvmMsm":
        return EvmMsm(self)

    def msm_base(self, pt: EvmEcPoint) -> "EvmMsm":
        return EvmMsm(self, pairs=[(None, pt)])

    msm_base_proj = msm_base

    def msm_base_int(self, xy: Tuple[int, int]) -> "EvmMsm":
        return EvmMsm(self, pairs=[(None, self.ec_point_const(xy))])

    def msm_constant(self, s: EvmScalar) -> "EvmMsm":
        return EvmMsm(self, constant=s)

    def msm_sum(self, exprs: List["EvmMsm"]) -> "EvmMsm":
        out = EvmMsm(self)
        for e in exprs:
            out = out + e
        return out

    def msm_evaluate(self, expr: "EvmMsm", g: Optional[EvmEcPoint] = None):
        """Lower to an ecMul/ecAdd precompile chain (loader.rs:655-667)."""
        terms: List[EvmEcPoint] = []
        for s, p in expr.pairs:
            if s is None or (s.is_const() and s.value[1] == 1):
                terms.append(p)
            else:
                terms.append(self.ec_mul(p, s))
        if expr.const is not None:
            assert g is not None, "constant term needs the generator"
            terms.append(self.ec_mul(g, expr.const))
        assert terms, "empty MSM"
        acc = terms[0]
        for t in terms[1:]:
            acc = self.ec_add(acc, t)
        return acc

    # --------------------------------------------------- verifier interface

    def load_svk(self, srs) -> EvmEcPoint:
        return self.ec_point_const(srs.g)

    def affine(self, pt: EvmEcPoint) -> EvmEcPoint:
        return pt

    def accumulator_from_limbs(self, limbs: List[EvmScalar]):
        from ..pcs.kzg.accumulator import BITS, LIMBS

        assert len(limbs) == 4 * LIMBS
        chunks = [limbs[i * LIMBS : (i + 1) * LIMBS] for i in range(4)]
        lhs = self.ec_point_from_limbs(chunks[0], chunks[1], BITS)
        rhs = self.ec_point_from_limbs(chunks[2], chunks[3], BITS)
        return (lhs, rhs)

    @staticmethod
    def _g2_words(pt) -> Tuple[int, int, int, int]:
        """G2 point ((x0,x1),(y0,y1)) -> precompile word order
        (x1, x0, y1, y0) — imaginary limb first (decider.rs:115-126)."""
        (x0, x1), (y0, y1) = pt
        return (x1, x0, y1, y0)

    def decide_all(self, srs, accumulators: List[Tuple]):
        """One pairing for a single accumulator; keccak-RLC fold for many
        (decider.rs:129-170)."""
        from ..pairing import py_pairing as pp

        g2 = self._g2_words(srs.g2)
        minus_s_g2 = self._g2_words(pp.g2_neg(srs.s_g2))
        if len(accumulators) == 1:
            lhs, rhs = accumulators[0]
        else:
            lhs_pts = []
            rhs_pts = []
            first_ptr = None
            for l, r_ in accumulators:
                dl, dr = self.dup_ec_point(l), self.dup_ec_point(r_)
                if first_ptr is None:
                    first_ptr = dl.ptr()
                lhs_pts.append(dl)
                rhs_pts.append(dr)
            hash_ptr = self.keccak256(first_ptr, len(accumulators) * 0x80)
            chal_ptr = self.allocate(0x20)
            self.emit(f"mstore({_hx(chal_ptr)}, mod(mload({_hx(hash_ptr)}), f_q))")
            chal = EvmScalar(self, ("mem", chal_ptr))
            pows = self.powers(chal, len(accumulators))
            lhs = self.msm_evaluate(
                self.msm_sum([self.msm_base(p) * c for p, c in zip(lhs_pts, pows)])
            )
            rhs = self.msm_evaluate(
                self.msm_sum([self.msm_base(p) * c for p, c in zip(rhs_pts, pows)])
            )
        self.pairing(lhs, g2, rhs, minus_s_g2)
        return True  # the result is the generated contract's `success`

    # -------------------------------------------------------------- wrap-up

    def yul_code(self) -> str:
        body = "\n                ".join(
            line for stmt in self.stmts for line in stmt.split("\n")
        )
        return YUL_TEMPLATE.format(
            base_modulus=_hx(Q), scalar_modulus=_hx(R), runtime=body
        )


class EvmMsm:
    """Lazy constant·g + Σ scalarᵢ·baseᵢ over Yul handles."""

    __slots__ = ("loader", "const", "pairs")

    def __init__(self, loader: EvmLoader, constant: Optional[EvmScalar] = None,
                 pairs=None):
        self.loader = loader
        self.const = constant
        self.pairs = list(pairs or [])

    def __add__(self, other: "EvmMsm") -> "EvmMsm":
        L = self.loader
        c = self.const
        if other.const is not None:
            c = other.const if c is None else L.add(c, other.const)
        return EvmMsm(L, c, self.pairs + other.pairs)

    def __sub__(self, other):
        return self + (-other)

    def __neg__(self):
        L = self.loader
        c = None if self.const is None else L.neg(self.const)
        pairs = [
            (L.neg(s) if s is not None else L.scalar(-1), p) for s, p in self.pairs
        ]
        return EvmMsm(L, c, pairs)

    def __mul__(self, scalar: EvmScalar) -> "EvmMsm":
        L = self.loader
        c = None if self.const is None else L.mul(self.const, scalar)
        pairs = [
            (scalar if s is None else L.mul(s, scalar), p) for s, p in self.pairs
        ]
        return EvmMsm(L, c, pairs)

    __rmul__ = __mul__

    def size(self) -> int:
        return len(self.pairs)

    def try_constant(self):
        if self.pairs:
            return None
        return self.const if self.const is not None else self.loader.scalar(0)

    def split(self):
        return EvmMsm(self.loader, None, self.pairs), self.const


class EvmTranscriptCodegen:
    """Keccak transcript emission (system/halo2/transcript/evm.rs:28-150).

    Everything absorbed since the last squeeze occupies one contiguous memory
    window [buf_ptr, buf_end); squeeze hashes it, and the buffer restarts
    with a duplicate of the hash."""

    def __init__(self, loader: EvmLoader, num_instance: List[int],
                 proof_offset: int, has_initial_state: bool):
        self.L = loader
        self.buf_ptr = 0
        self.buf_len = 0
        if has_initial_state:
            p = loader.allocate(0x20)
            assert p == 0
            self.buf_len = 0x20
        self.stream = proof_offset  # calldata cursor for the proof bytes
        self.num_instance = list(num_instance)

    def load_instances(self) -> List[List[EvmScalar]]:
        """Instances precede the proof in calldata (util.rs:81-94)."""
        out = []
        offset = 0
        for n in self.num_instance:
            col = []
            for _ in range(n):
                col.append(self.L.calldataload_scalar(offset))
                offset += 0x20
            out.append(col)
        return out

    # -- transcript interface used by PlonkProof.read -------------------

    def common_scalar(self, s: EvmScalar):
        if s.is_const() and self.buf_ptr == 0 and self.buf_len in (0, 0x20):
            # transcript initial state: write into the pre-allocated slot
            self.L.emit(f"mstore({_hx(self.buf_ptr)}, {s.value[1]})")
            self.buf_len = 0x20
        else:
            assert s.value[0] == "mem", "absorbed scalar must be materialized"
            assert s.value[1] == self.buf_ptr + self.buf_len, (
                "transcript absorb must be memory-contiguous"
            )
            self.buf_len += 0x20

    def common_ec_point(self, p: EvmEcPoint):
        assert p.value[0] == "mem"
        assert p.value[1] == self.buf_ptr + self.buf_len
        self.buf_len += 0x40

    def squeeze_challenge(self) -> EvmScalar:
        L = self.L
        length = self.buf_len
        if length == 0x20:
            end = self.buf_ptr + length
            L.emit(f"mstore8({_hx(end)}, 1)")
            length = 0x21
        hash_ptr = L.keccak256(self.buf_ptr, length)
        chal_ptr = L.allocate(0x20)
        dup_ptr = L.allocate(0x20)
        L.emit(
            "{\n"
            f"    let hash := mload({_hx(hash_ptr)})\n"
            f"    mstore({_hx(chal_ptr)}, mod(hash, f_q))\n"
            f"    mstore({_hx(dup_ptr)}, hash)\n"
            "}"
        )
        self.buf_ptr = dup_ptr
        self.buf_len = 0x20
        return EvmScalar(L, ("mem", chal_ptr))

    def read_scalar(self) -> EvmScalar:
        s = self.L.calldataload_scalar(self.stream)
        self.stream += 0x20
        self.common_scalar(s)
        return s

    def read_n_scalars(self, n: int) -> List[EvmScalar]:
        return [self.read_scalar() for _ in range(n)]

    def read_ec_point(self) -> EvmEcPoint:
        p = self.L.calldataload_ec_point(self.stream)
        self.stream += 0x40
        self.common_ec_point(p)
        return p

    def read_n_ec_points(self, n: int) -> List[EvmEcPoint]:
        return [self.read_ec_point() for _ in range(n)]


YUL_TEMPLATE = """object "plonk_verifier" {{
    code {{
        function allocate(size) -> ptr {{
            ptr := mload(0x40)
            if eq(ptr, 0) {{ ptr := 0x60 }}
            mstore(0x40, add(ptr, size))
        }}
        let size := datasize("Runtime")
        let offset := allocate(size)
        datacopy(offset, dataoffset("Runtime"), size)
        return(offset, size)
    }}
    object "Runtime" {{
        code {{
            let success := 1
            let f_p := {base_modulus}
            let f_q := {scalar_modulus}
            function validate_ec_point(x, y) -> valid {{
                {{
                    let x_lt_p := lt(x, {base_modulus})
                    let y_lt_p := lt(y, {base_modulus})
                    valid := and(x_lt_p, y_lt_p)
                }}
                {{
                    let y_square := mulmod(y, y, {base_modulus})
                    let x_square := mulmod(x, x, {base_modulus})
                    let x_cube := mulmod(x_square, x, {base_modulus})
                    let x_cube_plus_3 := addmod(x_cube, 3, {base_modulus})
                    let is_affine := eq(x_cube_plus_3, y_square)
                    valid := and(valid, is_affine)
                }}
            }}
            {runtime}
            if iszero(success) {{ revert(0, 0) }}
            return(0, 0)
        }}
    }}
}}"""

"""EVM execution-trace debugger (reference parity: the vendored foundry
debugger TUI at snark-verifier/src/loader/evm/test/tui.rs fed by the revm
executor's DebugStep trace — here a tracing Yul VM with the same
step/jump/search navigation, host-only)."""

import io

from snark_verifier_tpu.loader.evm_debug import debug_yul, unparse
from snark_verifier_tpu.loader.yul_interp import execute_yul
from snark_verifier_tpu.sdk.evm import encode_calldata, gen_evm_verifier
from snark_verifier_tpu.sdk.proof_io import proof_to_bytes
from snark_verifier_tpu.sdk.snark import Snark
from snark_verifier_tpu.sdk.srs import toy_srs
from snark_verifier_tpu.system.standard_plonk import StandardPlonk, build_protocol, prove

SRC = """object "t" { object "Runtime" { code {
    function sq(x) -> y { y := mulmod(x, x, 97) }
    let a := calldataload(0)
    let b := sq(a)
    let c := sq(b)
    mstore(0x00, addmod(b, c, 97))
    return(0x00, 0x20)
} } }"""


def test_trace_steps_and_gas_match_plain_run():
    cd = (5).to_bytes(32, "big")
    tr = debug_yul(SRC, cd)
    ok, gas, data = execute_yul(SRC, cd)
    assert tr.success == ok and tr.gas_used == gas and tr.returndata == data
    # 5^2=25, 25^2=625%97=43, (25+43)%97=68
    assert int.from_bytes(tr.returndata, "big") == 68
    # leaf statements recorded with writes and inclusive gas costs
    lets = [s for s in tr.steps if s.text.startswith("let b")]
    assert len(lets) == 1 and lets[0].writes == {"b": 25}
    assert lets[0].gas_cost > 0
    st = tr.fun_stats["sq"]
    assert st.calls == 2 and st.total_gas >= st.self_gas > 0
    assert not tr.truncated


def test_reports_and_search():
    tr = debug_yul(SRC, (3).to_bytes(32, "big"))
    rep = tr.gas_report()
    assert "sq" in rep and "TOTAL" in rep
    listing = tr.render(0, 10)
    assert "let a := calldataload(0)" in listing
    idx = tr.find(r"addmod")
    assert idx is not None and "addmod" in tr.steps[idx].text
    assert tr.find(r"no_such_fn") is None


def test_tui_stream_session():
    tr = debug_yul(SRC, (2).to_bytes(32, "big"))
    out = io.StringIO()
    tr.tui(inp=io.StringIO("n\np\nj 2\n/mulmod\ng\nq\n"), out=out, page=3)
    text = out.getvalue()
    assert "yul debugger:" in text and "OK" in text
    assert "TOTAL" in text  # gas report printed by 'g'


def test_unparse_roundtrips_shapes():
    assert unparse(("let", ["x"], ("call", "add", [("num", 1), ("var", "y")]))) \
        == "let x := add(1, y)"
    assert unparse(("assign", ["a", "b"], ("call", "f", []))) == "a, b := f()"
    assert unparse(("if", ("var", "c"), ("block", []))) == "if c { ... }"


def test_debug_generated_verifier():
    """Trace a real generated verifier end-to-end: the debugger must agree
    with the plain interpreter on accept + gas, and attribute pairing gas."""
    srs = toy_srs(64)
    circ = StandardPlonk.rand(k=4, seed=11)
    protocol = build_protocol(circ, srs)
    from snark_verifier_tpu.transcript import EvmTranscriptPy

    scalars, points = prove(circ, protocol, srs, scheme="shplonk",
                            transcript=EvmTranscriptPy())
    snark = Snark(protocol, [list(circ.instance)], scalars, points)
    proof = proof_to_bytes(snark, "shplonk", fmt="evm")
    yul = gen_evm_verifier(protocol, srs, "shplonk")
    cd = encode_calldata(snark.instances, proof)
    tr = debug_yul(yul, cd)
    ok, gas, _ = execute_yul(yul, cd)
    assert tr.success and ok and tr.gas_used == gas
    # exactly one pairing staticcall, the single most expensive call
    pairings = [g for addr, g in tr.precompile_calls if addr == 8]
    assert len(pairings) == 1 and pairings[0] >= 45000
    assert "ecPairing" in tr.gas_report()

"""Tracing / cost-metering hooks (reference parity: the `display`-feature
ark-std timers used across the SDK — /root/reference/snark-verifier-sdk/src/
lib.rs:3-4, halo2.rs:111-122 — and the Loader cost-metering hooks at
snark-verifier/src/loader.rs:255-259).

Enable wall-clock spans with SNARK_TPU_TIMERS=1; device profiles with
`with profile_trace("/tmp/trace"): ...` (renders in TensorBoard/Perfetto).
Cost metering counts verifier-side group operations per span, the analogue
of EvmLoader's gas deltas (loader/evm/loader.rs:424-441).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List


def _enabled() -> bool:
    return os.environ.get("SNARK_TPU_TIMERS", "") not in ("", "0")


@contextlib.contextmanager
def timer(label: str):
    """start_timer!/end_timer! equivalent; prints to stderr when enabled."""
    if not _enabled():
        yield
        return
    t0 = time.perf_counter()
    yield
    print(f"[timer] {label}: {time.perf_counter() - t0:.3f}s", file=sys.stderr)


@contextlib.contextmanager
def profile_trace(out_dir: str):
    """Wrap a region in a JAX device profile (TensorBoard/Perfetto trace)."""
    import jax

    with jax.profiler.trace(out_dir):
        yield


@dataclass
class CostMeter:
    """Counts symbolic verifier work per span (Loader cost-metering hooks)."""

    spans: Dict[str, Dict[str, int]] = field(default_factory=dict)
    _stack: List[str] = field(default_factory=list)

    def start(self, identifier: str):
        self.spans.setdefault(identifier, {})
        self._stack.append(identifier)

    def end(self, identifier: str):
        assert self._stack and self._stack[-1] == identifier
        self._stack.pop()

    def count(self, kind: str, n: int = 1):
        for ident in self._stack:
            span = self.spans[ident]
            span[kind] = span.get(kind, 0) + n

    def report(self) -> str:
        lines = []
        for ident, span in self.spans.items():
            ops = ", ".join(f"{k}={v}" for k, v in sorted(span.items()))
            lines.append(f"{ident}: {ops}")
        return "\n".join(lines)


METER = CostMeter()

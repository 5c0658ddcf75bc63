"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (mirrors the reference's single-process testing posture —
SURVEY.md §4 — adapted to mesh testing via host-platform device emulation).

Note: this image's JAX build hardcodes `jax_platforms='axon,cpu'` at import, so
plain JAX_PLATFORMS env vars are ignored; we must override via config.update
before any backend initialization."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: EC/pairing kernels are compile-heavy; reuse across
# test runs.  NOTE: a separate directory from the TPU runs' .jax_cache — that
# one accumulates CPU AOT entries compiled on the remote axon host whose CPU
# features differ (loading them risks SIGILL, observed as suite crashes).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(session, config, items):
    """Schedule the evm-transcript e2e module first: this image's XLA:CPU
    compiler segfaults (deterministically: 3 reproductions) when that
    module's verify graph compiles AFTER test_aggregation's modules in the
    same process; compiling it first avoids the crash (measured: the same
    three files pass, 15/15, when reordered).  Stable sort — everything else
    keeps its order."""
    items.sort(key=lambda it: 0 if "test_evm_transcript" in it.nodeid else 1)

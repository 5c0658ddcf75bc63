"""AOT executable cache: compile-latency engineering at point of use.

The per-protocol jit specialization mirrors the reference's per-circuit
monomorphization, but on the axon TPU backend the big verify/decide modules
cost minutes to compile and the XLA persistent cache does not reliably reuse
them across processes (PERFNOTES round 2: 416s in back-to-back processes).
PJRT *executable serialization* does work through axon (measured: 0.4s
compile → 83KB blob → 0.08s deserialize in a fresh process), so this module
caches whole compiled executables keyed on (protocol, srs, scheme, shapes,
backend, jax version) — the role the reference's file cache plays for pk/
snark artifacts (snark-verifier-sdk/src/lib.rs:79-159), applied to compiled
verifier programs.

Enabled on TPU backends only: on XLA:CPU, executable serialization is the
root-caused segfault source (tests/conftest.py header) — never enable it
there.  SNARK_AOT=0 disables; SNARK_AOT_DIR overrides the cache directory.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional, Sequence


def enabled() -> bool:
    import jax

    env = os.environ.get("SNARK_AOT")
    if env is not None:
        return env.strip().lower() not in ("", "0", "false", "off", "no")
    return jax.default_backend() != "cpu"


def cache_dir() -> str:
    d = os.environ.get("SNARK_AOT_DIR")
    if not d:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        d = os.path.join(repo, ".aot_cache")
    os.makedirs(d, exist_ok=True)
    return d


_CODE_FP: Optional[str] = None


def _code_fingerprint() -> str:
    """Content hash of the package's python sources: a cached executable
    must NOT outlive the code that built it (observed: a fold rewrite whose
    cache key matched served the old executable).  ~500 KB of source, ms."""
    global _CODE_FP
    if _CODE_FP is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for root, _dirs, files in sorted(os.walk(pkg)):
            for name in sorted(files):
                if name.endswith(".py"):
                    p = os.path.join(root, name)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()
    return _CODE_FP


def digest(key_parts: Sequence[Any]) -> str:
    """Stable cross-process digest of a cache key (repr-based; include
    shapes, protocol/srs content hashes — not object ids).  Salted with the
    package source fingerprint and backend identity."""
    import jax

    payload = repr((
        tuple(repr(p) for p in key_parts),
        _code_fingerprint(),
        jax.__version__,
        jax.default_backend(),
        getattr(jax.devices()[0], "device_kind", "?"),
    )).encode()
    return hashlib.sha256(payload).hexdigest()[:32]


def try_load(key: str) -> Optional[Callable]:
    """Deserialize a cached executable; None on any failure (falls back to a
    fresh compile, overwriting the stale entry)."""
    path = os.path.join(cache_dir(), key + ".pkl")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            blob = pickle.load(f)
        loaded = se.deserialize_and_load(*blob)
        os.utime(path)  # LRU touch for _prune
        return loaded
    except Exception as e:  # stale/incompatible entry: recompile
        try:
            os.unlink(path)
        except OSError:
            pass
        import sys

        print(f"# aot: reload failed ({type(e).__name__}: {e}), recompiling",
              file=sys.stderr, flush=True)
        return None


def save(key: str, compiled) -> None:
    try:
        from jax.experimental import serialize_executable as se

        blob = se.serialize(compiled)
        path = os.path.join(cache_dir(), key + ".pkl")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)
        _prune()
    except Exception as e:
        import sys

        print(f"# aot: serialize failed ({type(e).__name__}: {e}); "
              f"executable stays process-local", file=sys.stderr, flush=True)


def _prune() -> None:
    """Bound the cache: executables are 0.1–0.5 GB each; evict the
    least-recently-used entries past SNARK_AOT_MAX_BYTES (default 8 GB)."""
    limit = int(os.environ.get("SNARK_AOT_MAX_BYTES", str(8 << 30)))
    d = cache_dir()
    entries = []
    for name in os.listdir(d):
        if not name.endswith(".pkl"):
            continue
        p = os.path.join(d, name)
        try:
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
        except OSError:
            pass
    total = sum(s for _, s, _ in entries)
    for _, size, p in sorted(entries):  # oldest first
        if total <= limit:
            break
        try:
            os.unlink(p)
            total -= size
        except OSError:
            pass


def load_or_compile(key_parts: Sequence[Any], build: Callable[[], Callable],
                    args: Sequence[Any]) -> Callable:
    """AOT path: return a callable for `build()` specialized to `args`.
    Cache hit => deserialized executable (seconds); miss => lower+compile,
    serialize for the next process, return the compiled executable."""
    key = digest(key_parts)
    comp = try_load(key)
    if comp is not None:
        return comp
    comp = build().lower(*args).compile()
    save(key, comp)
    return comp

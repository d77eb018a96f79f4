"""Persistent XLA compilation cache, enabled for every framework entry point.

Why this exists: the benchmark chip sits behind a slow tunnel where a single
flagship sampler-scan compile takes 5-10 minutes (CLAUDE.md gotchas), and the
same programs are compiled over and over — bench.py on every driver round,
each queued revalidation script, the multichip dryrun, repeated test runs.
JAX's persistent compilation cache stores the serialized executable keyed by
(HLO fingerprint, compile options, backend/runtime version); a re-run of an
unchanged program loads from disk in seconds instead of recompiling.

The cache directory defaults to ``<repo>/.jax_cache`` because the repository
outlives any single session VM — a warm cache from one session accelerates
the next session and the driver's end-of-round bench. Override with
``HDMOE_COMPILE_CACHE=<dir>`` or disable with ``HDMOE_COMPILE_CACHE=off``.

Only compiles taking >= 10 s are persisted (``min_compile_time_secs``): the
test suite's thousands of tiny CPU programs would otherwise bloat the
directory for no win, while every tunnel-scale compile clears the bar by an
order of magnitude.

If the backend's PJRT plugin does not support executable serialization, JAX
logs a one-line warning and compiles as before — enabling the cache is never
worse than not having it. No reference analog (the reference re-JITs its
torch.compile artifacts from scratch per process, if at all).
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")

_enabled_dir: str | None = None


def _cpu_pinned() -> bool:
    """True when this process is pinned to the CPU backend — via the
    JAX_PLATFORM_NAME env var OR an already-applied
    ``jax.config.update("jax_platforms", "cpu")`` (smoke/dryrun scripts
    self-pin through jax.config only; round-4 review finding)."""
    if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
        return True
    try:
        import jax

        return (jax.config.jax_platforms or "").lower() == "cpu"
    except Exception:
        return False


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 10.0) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory, or None when disabled
    (``HDMOE_COMPILE_CACHE`` in {"off", "0", "none"}) or the directory
    cannot be created (e.g. read-only checkout) — both are silent no-ops so
    importing the package never fails over a cache.
    """
    global _enabled_dir
    env = os.environ.get("HDMOE_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return None
    # CPU-pinned runs (tests, dryruns, smoke — pinned via JAX_PLATFORM_NAME
    # or jax.config jax_platforms in this repo) must NOT share the cache:
    # XLA:CPU AOT results bake host machine features, and session hosts
    # vary — a cache entry compiled on an AVX-512/AMX host loads on a
    # weaker host with "could lead to execution errors such as SIGILL"
    # (observed round 4). The expensive compiles the cache exists for are
    # the TPU tunnel ones; CPU compiles are seconds. An EXPLICIT opt-in
    # (env var or path argument) bypasses the guard — a caller-chosen
    # per-host cache has none of the cross-host risk.
    if env == "" and path is None and _cpu_pinned():
        return None
    path = path or env or DEFAULT_DIR
    path = os.path.abspath(path)
    if _enabled_dir == path:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return None
    _enabled_dir = path
    return path

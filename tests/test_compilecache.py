"""Persistent-compilation-cache plumbing (hdmoe_tpu/compilecache.py).

The win itself (5-10 min tunnel compiles skipped on re-run) is only
observable on the benchmark chip; these tests pin the mechanics — the
package-import side effect points JAX at the repo cache dir, entries are
actually written once the compile-time threshold is met, and the env kill
switch works — on the CPU backend, where executable serialization is also
supported.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp

import hdmoe_tpu
from hdmoe_tpu.compilecache import DEFAULT_DIR, enable_persistent_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_import_skips_cache_on_cpu_pinned_runs():
    """CPU-pinned processes (this test suite, dryruns) must NOT attach the
    shared cache: XLA:CPU AOT entries bake host machine features, and a
    stale entry from a different session host loads with SIGILL-risk
    warnings (round-4 find). conftest pins JAX_PLATFORM_NAME=cpu, so the
    import above must have left the cache unconfigured."""
    assert jax.config.jax_compilation_cache_dir in (None, "")


def test_package_import_enables_repo_cache_dir_off_cpu():
    """Without the CPU pin (the TPU/bench path), package import points the
    cache at the repo dir with the tiny-program threshold."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORM_NAME", "HDMOE_COMPILE_CACHE")}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax, hdmoe_tpu\n"
         "print(repr(jax.config.jax_compilation_cache_dir))\n"
         "print(jax.config.jax_persistent_cache_min_compile_time_secs)"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    assert lines[-2] == repr(DEFAULT_DIR), out.stdout
    assert float(lines[-1]) >= 10.0


def test_cache_writes_an_entry(tmp_path):
    """Entries are written once the threshold is met.

    Runs in a SUBPROCESS: JAX's persistent-cache object latches on the
    first cacheable compile of the process, so re-pointing the dir from
    inside a long pytest run (where earlier tests already compiled) is
    silently ignored — this test failed under full-suite ordering when it
    mutated the live process's config (round-3 find). The production path
    configures the cache at package import, before any compile, so only
    the in-process re-point was unsound, not the feature."""
    cache_dir = str(tmp_path / "cache")
    env = dict(os.environ, HDMOE_COMPILE_CACHE=cache_dir,
               JAX_PLATFORM_NAME="cpu", PYTHONDONTWRITEBYTECODE="1")
    prog = (
        "import jax, jax.numpy as jnp, hdmoe_tpu\n"
        "from hdmoe_tpu.compilecache import enable_persistent_cache\n"
        "import hdmoe_tpu.compilecache as cc\n"
        "cc._enabled_dir = None\n"  # re-enter to lower the threshold
        f"assert enable_persistent_cache({cache_dir!r}, min_compile_secs=0.0)\n"
        "f = jax.jit(lambda x: jnp.tanh(x @ x.T) * 12345.678)\n"
        "f(jnp.ones((64, 64))).block_until_ready()\n"
    )
    out = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr
    assert os.listdir(cache_dir), "no cache entry written at min_compile_secs=0"


def test_env_kill_switch():
    env = dict(os.environ, HDMOE_COMPILE_CACHE="off",
               JAX_PLATFORM_NAME="cpu", PYTHONDONTWRITEBYTECODE="1")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax, hdmoe_tpu; print(repr(jax.config.jax_compilation_cache_dir))"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() in ("None", "''"), out.stdout

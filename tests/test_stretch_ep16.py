"""The 64-expert / 16-way expert-parallel stretch config (BASELINE.md:
"64 experts sharded across a v5e-16 slice with all-to-all expert
parallelism") exercised end-to-end at dry-run scale.

Runs in a subprocess because the 16-device virtual CPU mesh needs its own
XLA_FLAGS (this suite's processes are pinned to 8 devices by conftest)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stretch_ep16_subprocess():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # breaks the axon plugin init (CLAUDE.md)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORM_NAME"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from __graft_entry__ import dryrun_stretch_ep; dryrun_stretch_ep(16)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "64-expert HETEROGENEOUS" in proc.stdout
    assert "top-2 all-to-all EP" in proc.stdout

"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run hermetically (the driver validates the real multi-chip path via
__graft_entry__.dryrun_multichip)."""

import os

# NOTE: in this environment the axon TPU plugin ignores JAX_PLATFORMS; use
# JAX_PLATFORM_NAME + jax.config to reliably pin tests to CPU.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

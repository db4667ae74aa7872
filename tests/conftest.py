"""Test environment: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (multi-chip is validated on a virtual mesh — the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force-set (not setdefault): the harness environment pins
# JAX_PLATFORMS=axon (a tunneled TPU). Tests must run on local CPU devices;
# the axon PJRT plugin may have been registered by sitecustomize at
# interpreter start, but with JAX_PLATFORMS=cpu it is never initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env-var set above is ineffective when the harness sitecustomize has
# ALREADY imported jax (its registration hook runs at interpreter start, and
# jax captures JAX_PLATFORMS at import). Update the live config too, before
# any backend initializes — otherwise tests silently run on the tunneled TPU
# (slow, and different float arithmetic breaks the bit-exactness pins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend())

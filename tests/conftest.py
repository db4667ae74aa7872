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

jax.config.update("jax_default_matmul_precision", "highest")

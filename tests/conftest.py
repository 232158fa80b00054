"""Test configuration: force CPU platform with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware, as the
driver's dryrun does (xla_force_host_platform_device_count).

Note: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
env var, so we must set the platform via jax.config before any backend is
initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU even if the launch environment selects a TPU platform: the test
# suite must exercise the 8-device virtual mesh deterministically in fp32.
# The launch environment may pin a hardware platform via jax.config at
# interpreter start (sitecustomize), so the env var alone is not enough —
# override the config explicitly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    "tests require the 8-device virtual CPU mesh, got: " + str(jax.devices())
)

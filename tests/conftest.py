"""Test config: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

Note: jax may already be imported by the environment (site preload), so
env vars alone are not enough — use jax.config.update, which takes
effect as long as the backend hasn't initialized yet. XLA_FLAGS is read
at backend init, so setting it here still works.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# JAX_PLATFORMS=cpu alone does not unregister the experimental axon TPU
# plugin; the config knob does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

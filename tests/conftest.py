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

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full suite compiles several hundred XLA:CPU programs in one
    process; with everything retained, jaxlib 0.9.0's CPU compiler
    segfaults deterministically partway through the run (observed in
    ``backend_compile_and_load`` during test_train_steps after ~15
    modules; any subset of the suite passes). Each module's tests still
    share compilations via their module-scoped fixtures — only
    cross-module retention goes."""
    yield
    jax.clear_caches()
    gc.collect()

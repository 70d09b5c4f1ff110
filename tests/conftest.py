"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

NOTE: in this image, `sitecustomize` imports jax at interpreter startup,
so JAX_PLATFORMS set via os.environ here would be read too late. We use
jax.config.update("jax_platforms", ...) which takes effect as long as no
backend has been initialized yet. XLA_FLAGS is read when the CPU client
initializes, which also has not happened yet at conftest time.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); numerical parity tests use
float64, which TPU does not execute natively.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + jax.devices()[0].platform
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

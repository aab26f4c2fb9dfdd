"""Test env: force the JAX CPU backend with 8 virtual devices so mesh /
sharding tests run without TPU hardware.

Env vars alone are not enough when a sitecustomize pre-imports jax and
pins the platform (e.g. the axon TPU tunnel), so we also override via
jax.config before any backend is initialized (device initialization is
lazy, so XLA_FLAGS set here still takes effect).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

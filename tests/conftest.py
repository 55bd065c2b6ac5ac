"""Test config: run everything on a virtual 8-device CPU mesh.

The environment pre-registers a remote TPU backend (JAX_PLATFORMS=axon via
sitecustomize) whose initialization dials a tunnel and takes ~70s; tests
must not touch it. `jax.config.update('jax_platforms', 'cpu')` overrides
the env var as long as it runs before the first backend use, which a
top-level conftest guarantees. XLA_FLAGS must also be set before backend
init to get the 8 virtual CPU devices used by the sharding tests.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

"""Test configuration: force an 8-virtual-device CPU platform.

The environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel); tests must run
on CPU with 8 virtual devices so multi-chip sharding is exercised without
hardware.  ``XLA_FLAGS`` must be set before the XLA backend initialises and
``jax_platforms`` must be overridden via config (the env var is claimed by the
axon plugin), so this conftest runs both before any test imports jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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

# Persistent compilation cache: the suite is dominated by CPU jit compiles
# (pose_from_rays, the tiny-model inference paths, rasterizer grads — the
# top offenders are 20-70 s of XLA compile each).  Caching them across runs
# cuts repeat suite wall-time several-fold; the first run in a fresh
# checkout pays full price.  Keyed by jaxlib version internally, so stale
# entries are misses, never wrong results.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment may pre-register a TPU backend (axon) via sitecustomize and
force jax_platforms to it with jax.config.update — which overrides the
JAX_PLATFORMS env var. Tests must run on CPU (fast, deterministic, and with
8 virtual devices for multi-chip sharding tests), so we override the config
back before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite re-traces identical programs
# every session; caching cuts wall time dramatically on re-runs
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache", "cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

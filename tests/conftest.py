"""Test configuration: run on a virtual 8-device CPU mesh.

Real TPU hardware in this environment is a single chip; multi-chip sharding
is validated on virtual CPU devices as the driver does for
``__graft_entry__.dryrun_multichip``.
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (TPU tunnel), and a
# sitecustomize module imports jax at interpreter start, so the env var alone
# is read too late — jax.config.update below is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache for CPU test runs: the suite's cost is
# dominated by pipeline compiles; with the cache, re-runs (and CI
# re-invocations within an image) hit compiled executables instead.
# Scoped under /tmp: per-machine, never committed.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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

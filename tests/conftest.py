"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices (the driver separately dry-runs the multichip path).
Must set XLA flags before jax initializes.
"""
import os
import pathlib

# The container env pins JAX_PLATFORMS=axon (TPU tunnel); tests must override
# it, not setdefault, or every jit goes through remote TPU compilation.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Env alone is not enough: the baked axon plugin wins unless the config is
# set explicitly after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite is compile-dominated (dozens of
# distinct while-loop ICP programs on a 2-core box), so cache every program
# to disk.  First run pays compile; reruns are pure compute.
_cache_dir = pathlib.Path(__file__).resolve().parent / ".jax_cache"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices (the driver separately dry-runs the multichip path).
Must set XLA flags before jax initializes.
"""
import os

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

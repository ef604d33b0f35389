"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so multi-chip sharding logic is
exercised without TPU hardware; the real-chip path is covered by bench.py and
the driver's compile checks.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers the axon (TPU) backend and forces
# jax_platforms="axon,cpu" via jax.config, overriding the env var; undo that
# before any backend is initialized so tests run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on a CPU mesh
(xla_force_host_platform_device_count); the driver separately
compile-checks the TPU path via __graft_entry__.py, and bench.py runs on
the real chip.
"""

import os

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# does force CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

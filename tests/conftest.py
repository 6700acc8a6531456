"""Test harness configuration.

Tests run on CPU with 8 virtual devices so SPMD/sharding tests exercise real
multi-device semantics without TPU hardware (same test code runs unchanged on
a pod slice).  Must be set before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu";
# override after import so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

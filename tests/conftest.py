"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding paths are validated without TPU hardware via
``xla_force_host_platform_device_count`` (the standard JAX fake-mesh recipe);
float64 is enabled so convergence-order tests for the 5th-order WENO scheme
aren't limited by the f32 rounding floor.
"""
import os

# Force CPU: the session environment pins JAX to a remote TPU tunnel (an
# 'axon' backend registered from sitecustomize), which must not be used for
# unit tests.  The env var alone is not enough — the site hook overrides the
# platform list — so also reset the config knob before backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # config name drift across jax versions
    pass
jax.config.update("jax_enable_x64", True)

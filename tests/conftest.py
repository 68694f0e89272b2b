"""Test configuration: force an 8-device virtual CPU mesh.

The suite must run without TPU hardware (and must not steal the single real
chip from a concurrent bench run).  The environment's axon sitecustomize
overrides JAX_PLATFORMS at interpreter start, so the platform is forced to
cpu via jax.config here, before any backend initializes.  Sharded-path tests
use XLA's host-platform device-count override (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

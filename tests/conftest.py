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

# persistent XLA compile cache: the suite is COMPILE-bound (256 tests,
# ~15.5 min cold, mostly multi-second CPU compiles of epoch/eval programs).
# Warm runs skip every compile whose program is unchanged — measured
# cutting the suite roughly in half — without dropping any test.  The
# cache key covers program + flags + jaxlib version, so stale hits are
# structurally impossible; the dir is gitignored.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

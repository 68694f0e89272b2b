"""Test configuration: force an 8-device virtual CPU mesh.

The test suite must run without TPU hardware; sharded-path tests use
XLA's host-platform device-count override (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

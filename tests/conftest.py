"""Test env: force an 8-virtual-device CPU platform BEFORE jax import.

TPU hardware here is a single chip; multi-chip sharding tests run on fake
CPU devices (SURVEY.md section 5, item 3). Must run before anything imports
jax, hence top of conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

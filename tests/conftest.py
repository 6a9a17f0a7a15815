"""Test env: force an 8-virtual-device CPU platform before first backend use.

TPU hardware here is a single chip; multi-chip sharding tests run on fake
CPU devices (SURVEY.md section 5, item 3). Two subtleties:
  * the driver environment pre-sets JAX_PLATFORMS=axon (the real TPU), and
  * importing pytest already imports jax (plugin entry points), so the env
    var is read before this file runs.
Hence: set XLA_FLAGS (read lazily at backend creation) and override the
platform via jax.config, which works any time before first backend use.
Set SERT_TEST_PLATFORM to run the suite on another backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("SERT_TEST_PLATFORM", "cpu"))

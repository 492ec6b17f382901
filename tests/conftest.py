"""Test config: force CPU platform with 8 virtual devices.

Gives the CPU coverage the reference lacks (its suite is skipped entirely
without a GPU, ``tt_embeddings_test.py:53``) and lets sharding tests build
an 8-device mesh without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

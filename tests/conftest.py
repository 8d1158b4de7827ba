# coding=utf-8
"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware — sharding logic runs on a fake 8-device CPU
mesh (the standard JAX trick, SURVEY.md §4).  Must set flags before jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin in this environment overrides JAX_PLATFORMS; the config
# update below reliably forces the CPU client (and with it the 8 fake devices).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_numpy_rank_promotion", "raise")

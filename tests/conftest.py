"""Test harness config: run all tests on CPU with 8 virtual devices.

Must set env vars before jax initializes (reference had no test suite at all;
see SURVEY.md §4 — multi-device CPU simulation is our addition)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # oracle comparisons use float64

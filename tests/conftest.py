"""Test harness config: run all tests on CPU with 8 virtual devices.

Must set env vars before jax initializes (reference had no test suite at all;
see SURVEY.md §4 — multi-device CPU simulation is our addition).

Sharding: the full suite is ~45 min on this 1-core host and one end-of-run
native abort was observed at >200 tests in one process (RSS growth across
hundreds of compiled executables). ``--shard i/n`` partitions test FILES
deterministically (crc32 of the file name) so each shard runs in a fresh
process, e.g.:

    python -m pytest tests/ -q --shard 1/3
    python -m pytest tests/ -q --shard 2/3
    python -m pytest tests/ -q --shard 3/3

A persistent XLA compile cache under /tmp makes repeated runs (and the
CLI-in-process tests that compile the same train step twice) warm.
"""

import os
import zlib

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
# Persistent compile cache: cache is keyed by HLO hash, so reruns and the
# resume-path recompiles inside tests hit it instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/rubiks_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_addoption(parser):
    parser.addoption(
        "--shard", default=None, metavar="i/n",
        help="run only test files assigned to shard i of n (1-based; "
             "files are assigned by crc32 so the split is stable)",
    )


def pytest_collection_modifyitems(config, items):
    shard = config.getoption("--shard")
    if not shard:
        return
    idx, total = (int(v) for v in shard.split("/"))
    assert 1 <= idx <= total, shard
    import pytest

    skip = pytest.mark.skip(reason=f"not in shard {shard}")
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if zlib.crc32(fname.encode()) % total != idx - 1:
            item.add_marker(skip)

"""Platform selection helper.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so scripts call this
before first jax use to honor RUBIKS_PLATFORM (e.g. RUBIKS_PLATFORM=cpu for
driving the CLIs without a TPU).
"""

import os


def select_platform(compilation_cache: bool = False):
    """Honor RUBIKS_PLATFORM and optionally enable the persistent compilation
    cache (set RUBIKS_COMPILE_CACHE=<dir>). Opt-in only: on this tunneled
    runtime CPU compiles are served by a remote host with different CPU
    features, and cached AOT artifacts can SIGILL when reloaded locally."""
    import jax

    plat = os.environ.get("RUBIKS_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if compilation_cache or os.environ.get("RUBIKS_COMPILE_CACHE"):
        cache_dir = os.environ.get(
            "RUBIKS_COMPILE_CACHE",
            os.path.expanduser("~/.cache/rubiksnet_tpu/jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

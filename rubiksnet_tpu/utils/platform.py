"""Platform selection helper.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so scripts call this
before first jax use to honor RUBIKS_PLATFORM (e.g. RUBIKS_PLATFORM=cpu for
driving the CLIs without a TPU).
"""

import os


def select_platform(compilation_cache: bool = None):
    """Honor RUBIKS_PLATFORM and configure the persistent compilation cache.

    The cache defaults ON for TPU runs (RUBIKS_COMPILE_CACHE=0 disables):
    TPU executables are target-stable, first compiles of the big models take
    minutes, and on this tunneled runtime a wedged remote compile helper can
    otherwise make even previously-built programs unrunnable. It stays OFF
    for CPU (compiles are served by a remote host with different CPU
    features; cached AOT artifacts can SIGILL when reloaded locally)."""
    import jax

    plat = os.environ.get("RUBIKS_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    env = os.environ.get("RUBIKS_COMPILE_CACHE")
    if compilation_cache is None:
        # Decide from the *resolved* backend, not the env var: with
        # RUBIKS_PLATFORM unset on a CPU-only host the cache must stay off
        # (cached CPU AOT artifacts can SIGILL when compiled remotely).
        try:
            backend = jax.default_backend()
        except RuntimeError:
            backend = "cpu"
        compilation_cache = backend == "tpu" and env != "0"
    if compilation_cache or (env and env != "0"):
        cache_dir = (
            env if env and env not in ("0", "1")
            else os.path.expanduser("~/.cache/rubiksnet_tpu/jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

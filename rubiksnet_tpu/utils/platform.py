"""Platform selection helper.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so scripts call this
before first jax use to honor RUBIKS_PLATFORM (e.g. RUBIKS_PLATFORM=cpu for
driving the CLIs without a TPU).
"""

import os


def select_platform():
    plat = os.environ.get("RUBIKS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

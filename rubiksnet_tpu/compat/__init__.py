"""Parity ports of reference code that is DEAD at reference runtime.

Nothing in this package is used by any production path of rubiksnet_tpu; it
exists so users migrating code that imported the reference's dead surfaces
(e.g. rubiksnet/shiftlib/rubiks3d/adaptive_avgmax_pool.py, never imported by
the reference itself) find a drop-in here. See docs/PARITY.md.
"""

from .pooling import (
    SelectAdaptivePool2d,
    adaptive_avg_pool2d,
    adaptive_avgmax_pool2d,
    adaptive_catavgmax_pool2d,
    adaptive_max_pool2d,
    select_adaptive_pool2d,
)

__all__ = [
    "SelectAdaptivePool2d",
    "adaptive_avg_pool2d",
    "adaptive_avgmax_pool2d",
    "adaptive_catavgmax_pool2d",
    "adaptive_max_pool2d",
    "select_adaptive_pool2d",
]

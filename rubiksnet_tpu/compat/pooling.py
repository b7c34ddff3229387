"""Adaptive pooling utilities.

Functional port of rubiksnet/shiftlib/rubiks3d/adaptive_avgmax_pool.py (never
imported at runtime by the reference — kept for API-surface parity). All
functions operate on channel-last (..., H, W, C) tensors with output size 1
(the only configuration the reference models use: global pooling).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def adaptive_avg_pool2d(x, output_size: int = 1):
    assert output_size == 1, "only global pooling is supported"
    return jnp.mean(x, axis=(-3, -2), keepdims=True)


def adaptive_max_pool2d(x, output_size: int = 1):
    assert output_size == 1, "only global pooling is supported"
    return jnp.max(x, axis=(-3, -2), keepdims=True)


def adaptive_avgmax_pool2d(x, output_size: int = 1):
    """0.5 * (avg + max), as in the reference's 'avgmax' mode."""
    return 0.5 * (
        adaptive_avg_pool2d(x, output_size) + adaptive_max_pool2d(x, output_size)
    )


def adaptive_catavgmax_pool2d(x, output_size: int = 1):
    """Concatenate avg and max along channels ('catavgmax' mode)."""
    return jnp.concatenate(
        [adaptive_avg_pool2d(x, output_size), adaptive_max_pool2d(x, output_size)],
        axis=-1,
    )


def select_adaptive_pool2d(x, pool_type: str = "avg", output_size: int = 1):
    if pool_type == "avg":
        return adaptive_avg_pool2d(x, output_size)
    if pool_type == "max":
        return adaptive_max_pool2d(x, output_size)
    if pool_type == "avgmax":
        return adaptive_avgmax_pool2d(x, output_size)
    if pool_type == "catavgmax":
        return adaptive_catavgmax_pool2d(x, output_size)
    raise ValueError(f"Invalid pool type: {pool_type}")


class SelectAdaptivePool2d(nn.Module):
    """Selectable global pooling module (adaptive_avgmax_pool.py:64-87)."""

    pool_type: str = "avg"
    output_size: int = 1
    flatten: bool = False

    @nn.compact
    def __call__(self, x):
        out = select_adaptive_pool2d(x, self.pool_type, self.output_size)
        if self.flatten:
            out = out.reshape(out.shape[:-3] + (-1,))
        return out

    def feat_mult(self) -> int:
        return 2 if self.pool_type == "catavgmax" else 1

"""Attention-weighted temporal shift (the "AQ" temporal op).

Functional equivalent of rubiksnet/attention_shift.py:6-39: a per-channel
3-tap temporal kernel whose taps are softmax-normalized attention weights.
The reference materializes a grouped F.conv1d over a (N, C*H*W, T) reshape;
on TPU we express it directly as a weighted sum of three temporally shifted
copies (zero padded), which XLA fuses into a single VPU pass — no grouped
convolution or repeat_interleave materialization needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def attention_shift_weights(weight, temperature=2.0):
    """Normalize raw (C, 3) weights: divide by per-row std (torch.std is
    Bessel-corrected, ddof=1) + 1e-6, then softmax over taps with fixed
    temperature (attention_shift.py:29-30)."""
    std = jnp.std(weight, axis=1, keepdims=True, ddof=1)
    w = weight / (std + 1e-6)
    w = w / temperature
    w = w - jnp.max(w, axis=1, keepdims=True)
    e = jnp.exp(w)
    return e / jnp.sum(e, axis=1, keepdims=True)


def attention_shift(x, weight, temperature=2.0):
    """Apply the 3-tap attention shift along the T axis.

    Args:
      x: (N, T, H, W, C) channel-last clip tensor.
      weight: raw (C, 3) attention logits (the lazily-created parameter of
        attention_shift.py:24-27).

    F.conv1d with padding=1 is cross-correlation, so
    out[t] = w0 * x[t-1] + w1 * x[t] + w2 * x[t+1] with zero boundary frames.
    """
    w = attention_shift_weights(weight.astype(x.dtype), temperature)
    zeros = jnp.zeros_like(x[:, :1])
    x_prev = jnp.concatenate([zeros, x[:, :-1]], axis=1)
    x_next = jnp.concatenate([x[:, 1:], zeros], axis=1)
    w0 = w[:, 0].reshape(1, 1, 1, 1, -1)
    w1 = w[:, 1].reshape(1, 1, 1, 1, -1)
    w2 = w[:, 2].reshape(1, 1, 1, 1, -1)
    return w0 * x_prev + w1 * x + w2 * x_next

"""Select-unroll backend for the per-axis fractional shift.

out[o, c] = sum_j w[j, c] * x[o*stride - padding + j],  j in [-K, K+1]

with per-channel weights w[j, c] = (1-r_c) [k_c == j] + r_c [k_c + 1 == j]
(or a one-hot at the rounded position in quantize mode). Implemented as one
zero-pad followed by 2K+2 statically strided slices combined with per-channel
scalar weights — no gathers, no index tensors, no convolutions. XLA fuses the
whole thing into a single VPU pass over the tensor, which is the fastest
formulation we measured on TPU v5e (the gather backend materializes
full-tensor int32 index arrays; the depthwise-conv backend lowers poorly for
3D feature-grouped convs).

Like the conv backend this carries a static |floor(shift)| <= max_shift
bound; out-of-range shifts contribute zero. See conv_backend.py for the
validation story.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .shift_core import output_len

DEFAULT_MAX_SHIFT = 4


def inverse_shift_axis_select(
    og: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    d_in: int,
    quantize: bool = False,
    max_shift: int = DEFAULT_MAX_SHIFT,
) -> jax.Array:
    """Select-unroll equivalent of shift_core.inverse_shift_axis (half-up
    quantize semantics only).

    The stride-divisibility gating of the reference input-gradient kernels
    (cuda_src/rubiks3d_kernels.cu:586+) is obtained for free by interleaving
    stride-1 zeros into the upstream gradient — done with interior dilation in
    the same lax.pad as the halo padding — after which the inverse shift is a
    plain per-channel tap sum over statically shifted slices.
    """
    ndim = og.ndim
    d_out = og.shape[axis]
    k_pad = max_shift
    neg = -shift_c
    kf = jnp.floor(neg)
    r = (neg - kf).astype(og.dtype)
    ki = kf.astype(jnp.int32)

    # dilated length (d_out-1)*stride + 1, plus lo/hi halo zeros
    dil_len = (d_out - 1) * stride + 1
    hi_needed = (d_in - 1) + padding + 2 * k_pad + 1 - (dil_len - 1) - k_pad
    pad_cfg = [(0, 0, 0)] * ndim
    pad_cfg[axis] = (k_pad, max(hi_needed, 0), stride - 1)
    ogp = lax.pad(og, jnp.zeros((), og.dtype), pad_cfg)

    cshape = (1,) * (ndim - 1) + (-1,)

    def tap(j):
        start = [0] * ndim
        limit = list(ogp.shape)
        start[axis] = padding + j + k_pad
        limit[axis] = padding + j + k_pad + d_in
        return lax.slice(ogp, start, limit)

    out = None
    for j in range(-max_shift, max_shift + 2):
        if quantize:
            q = jnp.where(r < 0.5, ki, ki + 1)
            w = (q == j).astype(og.dtype)
        else:
            w = (ki == j).astype(og.dtype) * (1 - r) + (ki + 1 == j).astype(
                og.dtype
            ) * r
        term = tap(j) * w.reshape(cshape)
        out = term if out is None else out + term
    return out


def tapped_outputs_select(
    x: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    d_out: int,
    outputs,
    max_shift: int = DEFAULT_MAX_SHIFT,
):
    """Generic shared-slice tap machinery.

    outputs: list of tap-term lists; each term is (k_c, w_c) with per-channel
    integer offsets k_c (C,) in [-max_shift-1, max_shift+1] and weights w_c
    (C,). Returns [sum_terms sum_j (k_c == j) * w_c * x[o*stride - padding + j]
    for each output], computing each shifted slice of x exactly once.

    Used by the gradient paths where the corrected-corner taps need offsets
    one beyond the forward's range (cuda_src/rubiks3d_kernels.cu:288-298).
    """
    ndim = x.ndim
    d_in = x.shape[axis]
    k1 = max_shift + 1
    lo = k1 + padding
    hi_needed = (d_out - 1) * stride + k1 + 1 - padding - (d_in - 1)
    pad_cfg = [(0, 0, 0)] * ndim
    pad_cfg[axis] = (lo, max(hi_needed, 0), 0)
    xp = lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
    cshape = (1,) * (ndim - 1) + (-1,)

    def tap(j):
        start = [0] * ndim
        limit = list(xp.shape)
        strides = [1] * ndim
        start[axis] = j + k1
        limit[axis] = j + k1 + (d_out - 1) * stride + 1
        strides[axis] = stride
        return lax.slice(xp, start, limit, strides)

    accs = [None] * len(outputs)
    for j in range(-k1, k1 + 2):
        sl = None
        for i, terms in enumerate(outputs):
            w = None
            for k_c, w_c in terms:
                wj = (k_c == j).astype(x.dtype) * w_c
                w = wj if w is None else w + wj
            # skip the slice if all weights are structurally zero? (dynamic;
            # just accumulate — XLA DCEs all-zero masks poorly, acceptable)
            if sl is None:
                sl = tap(j)
            term = sl * w.reshape(cshape)
            accs[i] = term if accs[i] is None else accs[i] + term
    return accs


def frac_shift_axis_select(
    x: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    quantize: bool = False,
    max_shift: int = DEFAULT_MAX_SHIFT,
) -> jax.Array:
    """Select-unroll equivalent of shift_core.frac_shift_axis (half_up
    quantize semantics). x: channel-last, `axis` in [1, ndim-2]."""
    ndim = x.ndim
    d_in = x.shape[axis]
    d_out = output_len(d_in, stride, padding)
    k = jnp.floor(shift_c)
    r = (shift_c - k).astype(x.dtype)
    ki = k.astype(jnp.int32)

    # Pad so every tap o*stride - padding + j (j in [-K, K+1]) is in bounds:
    # padded index = o*stride + j + (K) with lo pad = K + padding.
    lo = max_shift + padding
    hi_needed = (d_out - 1) * stride + (max_shift + 1) - padding - (d_in - 1)
    hi = max(hi_needed, 0)
    pad_cfg = [(0, 0, 0)] * ndim
    pad_cfg[axis] = (lo, hi, 0)
    xp = lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)

    cshape = (1,) * (ndim - 1) + (-1,)

    def tap(j):
        start = [0] * ndim
        limit = list(xp.shape)
        strides = [1] * ndim
        start[axis] = j + max_shift
        limit[axis] = j + max_shift + (d_out - 1) * stride + 1
        strides[axis] = stride
        return lax.slice(xp, start, limit, strides)

    out = None
    for j in range(-max_shift, max_shift + 2):
        if quantize:
            q = jnp.where(r < 0.5, ki, ki + 1)
            w = (q == j).astype(x.dtype)
        else:
            w = (ki == j).astype(x.dtype) * (1 - r) + (ki + 1 == j).astype(
                x.dtype
            ) * r
        term = tap(j) * w.reshape(cshape)
        out = term if out is None else out + term
    return out


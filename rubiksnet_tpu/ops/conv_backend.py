"""Depthwise-convolution backend for the per-axis fractional shift.

The per-channel 1D fractional shift

    out[o, c] = (1-r_c) * x[o*s - p + k_c, c] + r_c * x[o*s - p + k_c + 1, c]

is exactly a depthwise convolution with a per-channel kernel that is zero
except for taps (1-r_c, r_c) at offsets (k_c, k_c+1), provided |k_c| is
bounded by a static MAX_SHIFT. Zero padding reproduces the reference's
out-of-bounds semantics (cuda_src/rubiks3d_kernels.cu:101-106) and the conv
window stride reproduces the strided output grid.

This maps the shift onto XLA's native TPU convolution path instead of a
generic gather — typically much faster — at the cost of a static bound on the
integer part of the shift. Shifts whose integer part falls outside
[-max_shift, max_shift] contribute zero (they would mostly be out-of-bounds
reads anyway); callers validate the bound against concrete shift values at
checkpoint-load time (see models/pretrained.py) and fall back to the gather
backend if it is exceeded.

Note on quantize modes: the 3D 'half_up' rounding (floor(s + 0.5)) is
translation invariant, so it is expressible as a one-hot kernel; the 2D
'half_away' rounding of (base + shift) is not (it differs at exact negative
half-integer positions), so 2D quantize always uses the gather backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .shift_core import output_len

DEFAULT_MAX_SHIFT = 4


def _shift_kernel(shift_c, dtype, max_shift, quantize):
    """Build the (2*max_shift+2, C) depthwise kernel from per-channel shifts.

    Tap j corresponds to input offset j - max_shift.
    """
    k = jnp.floor(shift_c)
    r = (shift_c - k).astype(dtype)
    ki = k.astype(jnp.int32)
    taps = 2 * max_shift + 2
    j = jnp.arange(taps, dtype=jnp.int32)[:, None] - max_shift  # offsets
    if quantize:
        q = jnp.where(r < 0.5, ki, ki + 1)  # half_up (3D semantics)
        return (j == q[None, :]).astype(dtype)
    w0 = (j == ki[None, :]).astype(dtype) * (1 - r)[None, :]
    w1 = (j == (ki + 1)[None, :]).astype(dtype) * r[None, :]
    return w0 + w1


def frac_shift_axis_conv(
    x: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    quantize: bool = False,
    max_shift: int = DEFAULT_MAX_SHIFT,
) -> jax.Array:
    """Depthwise-conv equivalent of shift_core.frac_shift_axis (half_up
    quantize only). x: channel-last, any rank >= 3; `axis` in [1, ndim-2].
    """
    w = _shift_kernel(shift_c.astype(x.dtype), x.dtype, max_shift, quantize)
    return depthwise_axis_conv(x, w, axis, stride, padding, max_shift)


def depthwise_axis_conv(
    x: jax.Array,
    w: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    k_pad: int,
) -> jax.Array:
    """Per-channel 1D tap sum along `axis` as a depthwise conv.

    w: (taps, C) weights; tap j reads input offset j - k_pad, i.e.
    out[o, c] = sum_j w[j, c] * x[o*stride - padding + j - k_pad, c] with
    zero out-of-bounds fill. This is the one lowering of tap sums that XLA
    tiles well under output striding — strided lax.slice taps measured
    ~31 GiB/s on the train backward (docs/PERF_NOTES.md round 5)."""
    ndim = x.ndim
    c = x.shape[-1]
    d_in = x.shape[axis]
    d_out = output_len(d_in, stride, padding)
    taps = w.shape[0]

    # Build an N-D depthwise conv over the spatial dims (axes 1..ndim-2) with
    # kernel size `taps` along `axis` and 1 elsewhere.
    n_spatial = ndim - 2
    k_shape = [1] * n_spatial + [1, c]  # (*spatial, I/g=1, O=C)
    k_shape[axis - 1] = taps
    kernel = w.reshape(k_shape)

    # out[o] = sum_j w[j] x[o*stride + j - pad_lo] with pad_lo = k_pad + padding.
    pad_lo = k_pad + padding
    # choose pad_hi so the conv output length equals the reference formula
    pad_hi = (d_out - 1) * stride + taps - d_in - pad_lo
    pads = [(0, 0)] * n_spatial
    pads[axis - 1] = (pad_lo, max(pad_hi, 0))
    strides = [1] * n_spatial
    strides[axis - 1] = stride

    if pad_hi < 0:
        # conv can't "unpad"; trim the input tail instead
        trim = -pad_hi
        sl = [slice(None)] * ndim
        sl[axis] = slice(0, d_in - trim)
        x = x[tuple(sl)]
        pads[axis - 1] = (pad_lo, 0)

    spatial_chars = "DHW"[:n_spatial] if n_spatial <= 3 else None
    assert spatial_chars is not None, "conv backend supports <= 3 spatial dims"
    lhs_spec = "N" + spatial_chars + "C"
    rhs_spec = spatial_chars + "IO"
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=tuple(strides),
        padding=tuple(pads),
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
        feature_group_count=c,
        preferred_element_type=x.dtype,
        # TPU's default conv precision computes f32 in bf16 passes; the shift
        # must be numerically exact for f32 eval parity. For bf16 inputs the
        # default single-pass precision is already exact in-type (HIGHEST
        # would force slow multi-pass f32 emulation).
        precision=(
            lax.Precision.HIGHEST
            if jnp.dtype(x.dtype).itemsize >= 4
            else lax.Precision.DEFAULT
        ),
    )
    assert out.shape[axis] == d_out, (out.shape, axis, d_out)
    return out



def inverse_shift_axis_conv(
    og: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    d_in: int,
    quantize: bool = False,
    max_shift: int = DEFAULT_MAX_SHIFT,
) -> jax.Array:
    """Inverse (transposed) per-channel shift of the upstream gradient as a
    depthwise conv with input dilation.

    Same math as select_backend.inverse_shift_axis_select: negate the
    shifts, interleave stride-1 zeros (here via lhs_dilation instead of an
    interior lax.pad), tap-sum. Exists because the select version's dilated
    pad + slices run at ~36 GiB/s on the stride-2 entry blocks' train
    backward (docs/PERF_NOTES.md round 5) while XLA tiles the dilated conv
    properly. Requires padding <= max_shift (callers fall back to select
    otherwise)."""
    ndim = og.ndim
    c = og.shape[-1]
    d_out = og.shape[axis]
    taps = 2 * max_shift + 2
    pl = max_shift - padding
    assert pl >= 0, (max_shift, padding)

    w = _shift_kernel((-shift_c).astype(og.dtype), og.dtype, max_shift,
                      quantize)

    n_spatial = ndim - 2
    k_shape = [1] * n_spatial + [1, c]
    k_shape[axis - 1] = taps
    kernel = w.reshape(k_shape)

    dil_len = (d_out - 1) * stride + 1
    ph = max(d_in - 1 + taps - pl - dil_len, 0)
    pads = [(0, 0)] * n_spatial
    pads[axis - 1] = (pl, ph)
    lhs_dilation = [1] * n_spatial
    lhs_dilation[axis - 1] = stride

    spatial_chars = "DHW"[:n_spatial] if n_spatial <= 3 else None
    assert spatial_chars is not None
    lhs_spec = "N" + spatial_chars + "C"
    rhs_spec = spatial_chars + "IO"
    out = lax.conv_general_dilated(
        og,
        kernel,
        window_strides=(1,) * n_spatial,
        padding=tuple(pads),
        lhs_dilation=tuple(lhs_dilation),
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
        feature_group_count=c,
        preferred_element_type=og.dtype,
        precision=(
            lax.Precision.HIGHEST
            if jnp.dtype(og.dtype).itemsize >= 4
            else lax.Precision.DEFAULT
        ),
    )
    if out.shape[axis] > d_in:
        out = lax.slice_in_dim(out, 0, d_in, axis=axis)
    assert out.shape[axis] == d_in, (out.shape, axis, d_in)
    return out

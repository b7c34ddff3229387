"""Shared per-axis primitives for RubiksShift ops.

The reference CUDA kernels (reference: cuda_src/rubiks3d_kernels.cu:15-205,
cuda_src/rubiks2d_kernels.cu:94-145) compute, per output element, a gather of
2^D corner voxels followed by D-linear interpolation, with zero padding for
out-of-bounds reads and per-channel fractional shift values.

On TPU we exploit the fact that D-linear interpolation with zero OOB fill is
*separable*: it factors into D successive per-channel 1D fractional shifts.
With channel-last layout the channel dimension maps onto vector lanes, so each
1D shift is a (masked gather | lerp) that XLA vectorizes; the scatter-free
backward becomes another gather plus a deterministic reduction (replacing the
reference's atomicAdd accumulation, cuda_src/rubiks3d_kernels.cu:448-450).

All helpers below operate on an arbitrary axis of an N-D array whose *last*
axis is channels, with per-channel integer index arrays of shape (D_out, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def output_len(n: int, stride: int, padding: int) -> int:
    """Output length along one axis.

    Matches the truncated formula of the reference
    (rubiksnet/shiftlib/rubiks3d/primitive.py:24 and cuda_src/rubiks.cpp:18):
    ``(n + 2p - 1) / s + 1`` with C-style integer truncation.
    """
    if stride <= 0:
        raise ValueError(f"stride must be > 0, got {stride}")
    out = (n + 2 * padding - 1) // stride + 1
    if out < 0:
        raise ValueError(
            f"computed output size is negative: {out} "
            f"(input={n}, stride={stride}, padding={padding})"
        )
    return out


def _expand_idx(idx: jax.Array, ndim: int, axis: int) -> jax.Array:
    """Reshape per-channel index array (D, C) so it broadcasts against an
    ndim-rank channel-last tensor along `axis` (and the trailing channel axis).
    """
    shape = [1] * ndim
    shape[axis] = idx.shape[0]
    shape[-1] = idx.shape[1]
    return idx.reshape(shape)


def gather_axis_zero(x: jax.Array, idx: jax.Array, axis: int) -> jax.Array:
    """Gather ``x`` along ``axis`` at per-channel indices with zero OOB fill.

    Args:
      x: channel-last array, e.g. (N, T, H, W, C).
      idx: int32 (D_out, C) indices into ``x`` along ``axis``; out-of-range
        entries produce 0 (the reference kernels' zero-padding semantics).
      axis: axis of ``x`` to gather over (not the channel axis).
    """
    d_in = x.shape[axis]
    idx_b = _expand_idx(idx, x.ndim, axis)
    valid = (idx_b >= 0) & (idx_b < d_in)
    safe = jnp.clip(idx_b, 0, d_in - 1)
    gathered = jnp.take_along_axis(x, safe, axis=axis)
    return jnp.where(valid, gathered, jnp.zeros((), x.dtype))


def gather_axis_mask(
    x: jax.Array, idx: jax.Array, valid_extra: jax.Array, axis: int
) -> jax.Array:
    """Like gather_axis_zero but AND-ing an extra per-(pos, channel) validity
    mask (used for the stride-divisibility test in the input-gradient path,
    cuda_src/rubiks3d_kernels.cu:586+)."""
    d_in = x.shape[axis]
    idx_b = _expand_idx(idx, x.ndim, axis)
    valid = (idx_b >= 0) & (idx_b < d_in) & _expand_idx(valid_extra, x.ndim, axis)
    safe = jnp.clip(idx_b, 0, d_in - 1)
    gathered = jnp.take_along_axis(x, safe, axis=axis)
    return jnp.where(valid, gathered, jnp.zeros((), x.dtype))


def _cexpand(v: jax.Array, ndim: int) -> jax.Array:
    """Broadcast a per-channel vector (C,) against a channel-last ndim array."""
    return v.reshape((1,) * (ndim - 1) + (-1,))


def frac_shift_axis(
    x: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    quantize: bool,
    quantize_mode: str = "half_up",
) -> jax.Array:
    """Per-channel 1D fractional shift along `axis` with linear interpolation.

    Forward semantics of cuda_src/rubiks3d_kernels.cu:54-203 restricted to one
    axis: output position o reads input position ``o*stride - padding +
    shift_c`` with linear interpolation between floor and floor+1 taps and
    zero fill out of bounds.

    quantize_mode:
      'half_up': remainder < 0.5 rounds down (3D kernels,
        cuda_src/rubiks3d_kernels.cu:76-79).
      'half_away': round half away from zero of (base + shift) (2D kernels'
        round_fast, cuda_src/rubiks2d_kernels.cu:77-82,116-121). Note the 2D
        kernel rounds the *sum* of integer base and fractional shift, so the
        index grid enters the rounding (sign matters near the boundary).
    """
    d_in = x.shape[axis]
    d_out = output_len(d_in, stride, padding)
    base = jnp.arange(d_out, dtype=jnp.int32) * stride - padding  # (D_out,)
    sf = jnp.floor(shift_c)
    small = sf.astype(jnp.int32)  # (C,)
    r = (shift_c - sf).astype(x.dtype)  # remainder in [0, 1)

    if quantize:
        if quantize_mode == "half_up":
            q = jnp.where(r < 0.5, small, small + 1)  # (C,)
            idx = base[:, None] + q[None, :]
        elif quantize_mode == "half_away":
            v = base[:, None].astype(shift_c.dtype) + shift_c[None, :]
            idx = jnp.where(v < 0, jnp.trunc(v - 0.5), jnp.trunc(v + 0.5)).astype(
                jnp.int32
            )
        else:
            raise ValueError(quantize_mode)
        return gather_axis_zero(x, idx, axis)

    idx0 = base[:, None] + small[None, :]  # (D_out, C)
    g0 = gather_axis_zero(x, idx0, axis)
    g1 = gather_axis_zero(x, idx0 + 1, axis)
    rb = _cexpand(r, x.ndim)
    return (1 - rb) * g0 + rb * g1


def inverse_shift_axis(
    og: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    d_in: int,
    quantize: bool,
    quantize_mode: str = "half_up",
) -> jax.Array:
    """Transpose (input-gradient) of frac_shift_axis along one axis.

    Implements the scatter-as-gather inverse shift of
    cuda_src/rubiks3d_kernels.cu:455-723: each *input* position i pulls from
    output positions ``(i + padding + (-shift))/stride`` when divisible by the
    stride, with linear interpolation on the negated shift's remainder.

    Args:
      og: upstream gradient with output extent along `axis`.
      d_in: input extent along `axis` (size of the returned array's axis).
    """
    d_out = og.shape[axis]
    offs = jnp.arange(d_in, dtype=jnp.int32) + padding  # (D_in,)
    neg = -shift_c
    sf = jnp.floor(neg)
    small = sf.astype(jnp.int32)
    r = (neg - sf).astype(og.dtype)

    def strided_tap(j):
        # j: (D_in, C) raw output-grid coordinate before stride division.
        divisible = (j % stride) == 0
        q = j // stride
        return q, divisible

    if quantize:
        if quantize_mode == "half_up":
            qi = jnp.where(r < 0.5, small, small + 1)
            j = offs[:, None] + qi[None, :]
        elif quantize_mode == "half_away":
            v = offs[:, None].astype(shift_c.dtype) + neg[None, :]
            j = jnp.where(v < 0, jnp.trunc(v - 0.5), jnp.trunc(v + 0.5)).astype(
                jnp.int32
            )
        else:
            raise ValueError(quantize_mode)
        q, divisible = strided_tap(j)
        return gather_axis_mask(og, q, divisible, axis)

    j0 = offs[:, None] + small[None, :]
    q0, div0 = strided_tap(j0)
    q1, div1 = strided_tap(j0 + 1)
    g0 = gather_axis_mask(og, q0, div0, axis)
    g1 = gather_axis_mask(og, q1, div1, axis)
    rb = _cexpand(r, og.ndim)
    return (1 - rb) * g0 + rb * g1


def corrected_taps(
    x: jax.Array,
    shift_c: jax.Array,
    axis: int,
    stride: int,
    padding: int,
    d_out: int,
    int_tol: float = 0.0,
):
    """The two "corrected" corner gathers used by the shift-gradient kernels.

    The 3D backward kernel replaces the small tap with ``small - 1`` whenever
    the remainder is exactly zero (the ``input_small_Ta`` correction at
    cuda_src/rubiks3d_kernels.cu:288-298), yielding a backward finite
    difference at integer shifts. Returns (g_small, g_large, r, is_int) where
    r is the (possibly tolerance-zeroed) remainder.

    int_tol: 0.0 for the 3D exact-equality test; 1e-7 for the 2D kernels'
    ZERO_TOL (cuda_src/rubiks2d_kernels.cu:189-200).
    """
    base = jnp.arange(d_out, dtype=jnp.int32) * stride - padding
    sf = jnp.floor(shift_c)
    small = sf.astype(jnp.int32)
    r = (shift_c - sf).astype(x.dtype)
    if int_tol > 0.0:
        is_int = r < int_tol
    else:
        is_int = r == 0
    r = jnp.where(is_int, jnp.zeros((), r.dtype), r)
    small_corr = small - is_int.astype(jnp.int32)
    g_small = gather_axis_zero(x, base[:, None] + small_corr[None, :], axis)
    g_large = gather_axis_zero(x, base[:, None] + (small + 1)[None, :], axis)
    return g_small, g_large, r, is_int

"""Learnable fractional 2D shift (RubiksShift2D) — TPU-native implementation.

Reimplements cuda_src/rubiks2d_kernels.cu on channel-last (N, H, W, C) input:
  * forward (ibid. 94-145): bilinear per-channel fractional shift, zero OOB,
    strided output grid, quantize via round-half-away-from-zero of
    (base + offset) (round_fast, ibid. 76-82).
  * input gradient (ibid. 269-379): inverse shift with stride divisibility.
  * shift gradient (ibid. 147-266): analytic bilinear gradient; remainders
    within ZERO_TOL=1e-7 of zero are snapped to zero and that axis uses a
    halved central difference over a 3x3 window (ibid. 189-253).
  * per-channel L2 normalization of the (2, C) gradient (ibid. 381-397,
    applied when normalize_grad, cuda_src/rubiks.cpp:146-148).

The 2D gradient math differs from the 3D op (central vs. backward difference
at integer shifts, tolerance vs. exact zero test, no t-factor): both are
replicated faithfully.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import shift_core as core
from .conv_backend import DEFAULT_MAX_SHIFT, frac_shift_axis_conv
from .select_backend import (
    frac_shift_axis_select,
    inverse_shift_axis_select,
    tapped_outputs_select,
)

__all__ = [
    "rubiks_shift_2d",
    "rubiks_shift_2d_forward",
    "rubiks_shift_2d_input_grad",
    "rubiks_shift_2d_shift_grad",
    "normalize_shift_grad_2d",
    "compute_output_shape_2d",
]

_H_AX, _W_AX = 1, 2
_ZERO_TOL = 1e-7


def _pair(v):
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(u) for u in v)
    assert len(t) == 2, f"expected 2 entries, got {v}"
    return t


def compute_output_shape_2d(shape, stride, padding):
    n, h, w, c = shape
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return (n, core.output_len(h, sh, ph), core.output_len(w, sw, pw), c)


def rubiks_shift_2d_forward(
    x, shift, stride=(1, 1), padding=(0, 0), quantize=False,
    backend="gather", max_shift=DEFAULT_MAX_SHIFT,
):
    """x: (N, H, W, C); shift: (2, C) rows = (shift_H, shift_W).

    backend 'conv' uses the depthwise-convolution fast path (see
    conv_backend.py). 2D quantize always uses the gather backend because its
    round-half-away-from-zero of (base + shift) is not translation invariant.
    """
    assert x.ndim == 4, "x must be (N, H, W, C)"
    assert shift.shape == (2, x.shape[-1])
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    shift = shift.astype(x.dtype)
    if backend == "auto":
        from .auto_backend import choose_forward_backend

        # 2D = 3D with T=1 and an identity temporal row; quantize keeps the
        # gather path (half-away rounding has no tap representation).
        backend = "gather" if quantize else choose_forward_backend(
            (x.shape[0], 1) + x.shape[1:], (1, sh, sw), (0, ph, pw),
            quantize, max_shift, x.dtype,
        )
    if backend == "pallas" and not quantize:
        # The 2D shift is the 3D one-pass kernel with T=1 and an identity
        # temporal row.
        from .pallas.shift_kernel import (
            rubiks_shift3d_pallas, shift3d_pallas_supported,
        )

        x5 = x[:, None]
        if shift3d_pallas_supported(
            x5.shape, (1, sh, sw), (0, ph, pw), max_shift, x.dtype
        ):
            shift3 = jnp.concatenate(
                [jnp.zeros((1, x.shape[-1]), shift.dtype), shift]
            )
            return rubiks_shift3d_pallas(x5, shift3, max_shift, False)[:, 0]
        backend = "select"
    if backend == "conv" and not quantize:
        out = frac_shift_axis_conv(x, shift[0], _H_AX, sh, ph, False, max_shift)
        out = frac_shift_axis_conv(out, shift[1], _W_AX, sw, pw, False, max_shift)
        return out
    if backend == "select" and not quantize:
        out = frac_shift_axis_select(x, shift[0], _H_AX, sh, ph, False, max_shift)
        out = frac_shift_axis_select(out, shift[1], _W_AX, sw, pw, False, max_shift)
        return out
    out = core.frac_shift_axis(x, shift[0], _H_AX, sh, ph, quantize, "half_away")
    out = core.frac_shift_axis(out, shift[1], _W_AX, sw, pw, quantize, "half_away")
    return out


def rubiks_shift_2d_input_grad(
    og, shift, in_shape, stride=(1, 1), padding=(0, 0), quantize=False,
    backend="gather", max_shift=DEFAULT_MAX_SHIFT,
):
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    shift = shift.astype(og.dtype)
    if backend == "auto":
        from .auto_backend import choose_input_grad_backend

        backend = "gather" if quantize else choose_input_grad_backend(
            (og.shape[0], 1) + og.shape[1:], (in_shape[0], 1) + tuple(in_shape)[1:],
            (1, sh, sw), (0, ph, pw), quantize, max_shift, og.dtype,
        )
    if backend == "pallas" and not quantize:
        from .pallas.shift_kernel import (
            rubiks_shift3d_pallas, shift3d_pallas_supported,
        )

        og5 = og[:, None]
        if (
            shift3d_pallas_supported(
                og5.shape, (1, sh, sw), (0, ph, pw), max_shift, og.dtype
            )
            and og.shape == tuple(in_shape)
        ):
            shift3 = jnp.concatenate(
                [jnp.zeros((1, og.shape[-1]), shift.dtype), shift]
            )
            return rubiks_shift3d_pallas(
                og5, shift3, max_shift, False, inverse=True
            )[:, 0]
    if backend != "gather" and not quantize:
        # (2D quantize uses round-half-away semantics -> gather only)
        g = inverse_shift_axis_select(
            og, shift[0], _H_AX, sh, ph, in_shape[_H_AX], False, max_shift)
        g = inverse_shift_axis_select(
            g, shift[1], _W_AX, sw, pw, in_shape[_W_AX], False, max_shift)
        return g
    g = core.inverse_shift_axis(
        og, shift[0], _H_AX, sh, ph, in_shape[_H_AX], quantize, "half_away"
    )
    g = core.inverse_shift_axis(
        g, shift[1], _W_AX, sw, pw, in_shape[_W_AX], quantize, "half_away"
    )
    return g


def _axis_diff(x, shift_c, axis, stride, padding, d_out, is_int):
    """Difference operator along one axis for the 2D shift gradient.

    Non-integer remainder: forward difference between the +1 and +0 taps
    (cuda_src/rubiks2d_kernels.cu:215-221). Integer remainder (within
    ZERO_TOL): halved central difference between the +1 and -1 taps
    (ibid. 238-252).
    """
    base = jnp.arange(d_out, dtype=jnp.int32) * stride - padding
    small = jnp.floor(shift_c).astype(jnp.int32)
    idx0 = base[:, None] + small[None, :]
    g_m1 = core.gather_axis_zero(x, idx0 - 1, axis)
    g_0 = core.gather_axis_zero(x, idx0, axis)
    g_p1 = core.gather_axis_zero(x, idx0 + 1, axis)
    fwd = g_p1 - g_0
    cen = 0.5 * (g_p1 - g_m1)
    mask = core._cexpand(is_int, x.ndim)
    return jnp.where(mask, cen, fwd)


def _axis_lerp(x, shift_c, axis, stride, padding, d_out, r):
    """Standard (uncorrected) lerp along one axis with a pre-zeroed remainder."""
    base = jnp.arange(d_out, dtype=jnp.int32) * stride - padding
    small = jnp.floor(shift_c).astype(jnp.int32)
    idx0 = base[:, None] + small[None, :]
    g0 = core.gather_axis_zero(x, idx0, axis)
    g1 = core.gather_axis_zero(x, idx0 + 1, axis)
    rb = core._cexpand(r, x.ndim)
    return (1 - rb) * g0 + rb * g1


def _axis_diff_select(x, shift_c, axis, stride, padding, d_out, is_int, max_shift):
    small = jnp.floor(shift_c).astype(jnp.int32)
    ones = jnp.ones(shift_c.shape, x.dtype)
    g_m1, g_0, g_p1 = tapped_outputs_select(
        x, axis, stride, padding, d_out,
        [[(small - 1, ones)], [(small, ones)], [(small + 1, ones)]], max_shift,
    )
    fwd = g_p1 - g_0
    cen = 0.5 * (g_p1 - g_m1)
    mask = core._cexpand(is_int, x.ndim)
    return jnp.where(mask, cen, fwd)


def _axis_lerp_select(x, shift_c, axis, stride, padding, d_out, r, max_shift):
    small = jnp.floor(shift_c).astype(jnp.int32)
    w0 = (1 - r).astype(x.dtype)
    w1 = r.astype(x.dtype)
    g0, g1 = tapped_outputs_select(
        x, axis, stride, padding, d_out,
        [[(small, w0)], [(small + 1, w1)]], max_shift,
    )
    return g0 + g1


def rubiks_shift_2d_shift_grad(
    og, x, shift, stride=(1, 1), padding=(0, 0),
    backend="gather", max_shift=DEFAULT_MAX_SHIFT,
):
    """Raw (2, C) shift gradient per cuda_src/rubiks2d_kernels.cu:147-266."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    shift = shift.astype(x.dtype)
    ho, wo = og.shape[_H_AX], og.shape[_W_AX]
    if backend == "auto":
        backend = "select"

    def remainder(s):
        r = (s - jnp.floor(s)).astype(x.dtype)
        is_int = r < _ZERO_TOL
        return jnp.where(is_int, jnp.zeros((), r.dtype), r), is_int

    rh, int_h = remainder(shift[0])
    rw, int_w = remainder(shift[1])

    if backend == "gather":
        diff = lambda y, sc, ax, ss, pp, do, ii: _axis_diff(y, sc, ax, ss, pp, do, ii)
        lerp = lambda y, sc, ax, ss, pp, do, rr: _axis_lerp(y, sc, ax, ss, pp, do, rr)
    else:
        diff = lambda y, sc, ax, ss, pp, do, ii: _axis_diff_select(
            y, sc, ax, ss, pp, do, ii, max_shift)
        lerp = lambda y, sc, ax, ss, pp, do, rr: _axis_lerp_select(
            y, sc, ax, ss, pp, do, rr, max_shift)

    # d out / d shift_H = LerpW(DiffH(x)); d out / d shift_W = LerpH(DiffW(x)).
    dh = diff(x, shift[0], _H_AX, sh, ph, ho, int_h)
    grad_h_local = lerp(dh, shift[1], _W_AX, sw, pw, wo, rw)
    lh = lerp(x, shift[0], _H_AX, sh, ph, ho, rh)
    grad_w_local = diff(lh, shift[1], _W_AX, sw, pw, wo, int_w)

    reduce_axes = (0, 1, 2)
    gh = jnp.sum(og * grad_h_local, axis=reduce_axes)
    gw = jnp.sum(og * grad_w_local, axis=reduce_axes)
    return jnp.stack([gh, gw], axis=0)  # (2, C)


def normalize_shift_grad_2d(shift_grad):
    """Per-channel L2 normalization (cuda_src/rubiks2d_kernels.cu:381-397)."""
    mag = jnp.sqrt(jnp.sum(shift_grad * shift_grad, axis=0))
    safe = jnp.where(mag > 0, mag, jnp.ones_like(mag))
    return jnp.where(mag[None, :] > 0, shift_grad / safe[None, :], shift_grad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _rubiks_shift_2d_core(
    x, shift, stride, padding, normalize_grad, enable_shift_grad, quantize,
    backend, max_shift,
):
    return rubiks_shift_2d_forward(x, shift, stride, padding, quantize, backend, max_shift)


def _core_fwd(
    x, shift, stride, padding, normalize_grad, enable_shift_grad, quantize,
    backend, max_shift,
):
    out = rubiks_shift_2d_forward(x, shift, stride, padding, quantize, backend, max_shift)
    return out, (x, shift)


def _core_bwd(
    stride, padding, normalize_grad, enable_shift_grad, quantize, backend,
    max_shift, res, og,
):
    x, shift = res
    x_grad = rubiks_shift_2d_input_grad(
        og, shift, x.shape, stride, padding, quantize, backend, max_shift
    )
    if enable_shift_grad:
        shift_grad = rubiks_shift_2d_shift_grad(
            og, x, shift, stride, padding, backend, max_shift
        )
        if normalize_grad:
            shift_grad = normalize_shift_grad_2d(shift_grad)
    else:
        shift_grad = jnp.zeros_like(shift)
    return x_grad, shift_grad.astype(shift.dtype)


_rubiks_shift_2d_core.defvjp(_core_fwd, _core_bwd)


def rubiks_shift_2d(
    x,
    shift,
    stride=1,
    padding=0,
    normalize_grad=True,
    enable_shift_grad=True,
    quantize=False,
    backend="gather",
    max_shift=DEFAULT_MAX_SHIFT,
):
    """User-facing functional, mirroring
    rubiksnet/shiftlib/rubiks2d/primitive.py:178-200 on channel-last input."""
    assert x.ndim == 4, "x must be (N, H, W, C)"
    return _rubiks_shift_2d_core(
        x,
        shift,
        _pair(stride),
        _pair(padding),
        bool(normalize_grad),
        bool(enable_shift_grad),
        bool(quantize),
        str(backend),
        int(max_shift),
    )

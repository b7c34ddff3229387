"""Learnable fractional 3D shift (RubiksShift3D) — TPU-native implementation.

Reimplements, TPU-first, the behavior of the reference CUDA stack:
  * forward: cuda_src/rubiks3d_kernels.cu:15-205 (8-corner gather + trilinear
    interpolation, zero OOB fill, per-channel shifts, strided output grid,
    quantize mode)
  * input gradient: cuda_src/rubiks3d_kernels.cu:455-929 (inverse shift of the
    upstream gradient with stride-divisibility gating)
  * shift gradient: cuda_src/rubiks3d_kernels.cu:218-452 (plane-difference
    analytic gradient with the integer-remainder backward-difference
    correction), followed by summation over (N, T, H, W)
    (the atomicAdd + addmv_ reduction of cuda_src/rubiks.cpp:324-345 becomes a
    deterministic jnp.sum) and per-channel unit normalization with the
    normalize_t_factor semantics (cuda_src/rubiks3d_kernels.cu:932-960).

Everything is expressed through separable per-axis 1D ops (see shift_core.py)
over a channel-last (N, T, H, W, C) layout so the channel dimension maps onto
TPU vector lanes.

Gradient semantics note: the reference's normalized shift gradient is NOT the
true derivative of the forward (it is unit-normalized per channel — a form of
per-channel sign-SGD), so this op uses jax.custom_vjp rather than autodiff.
"""

from __future__ import annotations

import functools
import os

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
    "rubiks_shift_3d",
    "rubiks_shift_3d_forward",
    "rubiks_shift_3d_input_grad",
    "rubiks_shift_3d_shift_grad",
    "normalize_shift_grad_3d",
    "compute_output_shape_3d",
]

# Axis positions in the canonical channel-last video layout (N, T, H, W, C).
_T_AX, _H_AX, _W_AX = 1, 2, 3


def _triple(v):
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(u) for u in v)
    assert len(t) == 3, f"expected 3 entries, got {v}"
    return t


def compute_output_shape_3d(shape, stride, padding):
    """(N, T, H, W, C) output shape per the truncated formula of
    rubiksnet/shiftlib/rubiks3d/primitive.py:24-47."""
    n, t, h, w, c = shape
    st, sh, sw = _triple(stride)
    pt, ph, pw = _triple(padding)
    return (
        n,
        core.output_len(t, st, pt),
        core.output_len(h, sh, ph),
        core.output_len(w, sw, pw),
        c,
    )


def rubiks_shift_3d_forward(
    x,
    shift,
    stride=(1, 1, 1),
    padding=(0, 0, 0),
    quantize=False,
    backend="gather",
    max_shift=DEFAULT_MAX_SHIFT,
):
    """Pure forward pass (no autodiff rules attached).

    Args:
      x: (N, T, H, W, C) channel-last video tensor.
      shift: (3, C) per-channel fractional shifts, rows = (shift_T, shift_H,
        shift_W) — same parameter layout as the reference
        (rubiksnet/shiftlib/rubiks3d/layer.py:67).
      stride/padding: ints or 3-tuples (T, H, W).
      quantize: round shifts to integers (remainder < 0.5 rounds down,
        cuda_src/rubiks3d_kernels.cu:76-79) and skip interpolation.
      backend: 'gather' (exact for any shift magnitude), 'conv' (depthwise
        convolution with a static |floor(shift)| <= max_shift bound — the
        fast TPU path, see conv_backend.py), 'select', 'pallas', or 'auto'
        (per-shape fastest bounded path, see auto_backend.py).
      max_shift: static integer-shift bound for the conv backend.
    """
    assert x.ndim == 5, "x must be (N, T, H, W, C)"
    assert shift.shape == (3, x.shape[-1]), (
        f"shift must be (3, C={x.shape[-1]}), got {shift.shape}"
    )
    st, sh, sw = _triple(stride)
    pt, ph, pw = _triple(padding)
    if backend == "auto":
        from .auto_backend import choose_forward_backend

        backend = choose_forward_backend(
            x.shape, (st, sh, sw), (pt, ph, pw), quantize, max_shift, x.dtype
        )
    shift = shift.astype(x.dtype)
    # Trilinear interpolation with zero OOB fill is separable: apply the
    # per-channel 1D fractional shift along T, then H, then W.
    if backend == "conv":
        out = frac_shift_axis_conv(x, shift[0], _T_AX, st, pt, quantize, max_shift)
        out = frac_shift_axis_conv(out, shift[1], _H_AX, sh, ph, quantize, max_shift)
        out = frac_shift_axis_conv(out, shift[2], _W_AX, sw, pw, quantize, max_shift)
    elif backend == "mix":
        # T via select slices, H/W via per-frame depthwise convs. The
        # all-conv formulation expresses T as a 3-spatial-dim conv over the
        # 5D tensor, and XLA's layout assignment for that conv transposes
        # the whole activation twice (measured 13 of 121 ms on the Large
        # forward at stage0's 112x112 — xprof 2026-08-20). The T shift is
        # three whole-slab FMAs — layout-neutral as static slices — and the
        # flattened (N*T, H, W, C) H/W convs stay in the frame-conv layout.
        # (Measured and removed alternatives, 5-round e2e medians vs this:
        # a single outer-product HW depthwise conv 0.986x; the same outer
        # product as fused slice FMAs 0.22x — XLA materializes every strided
        # slice; the H/W taps as a one-pass per-frame Pallas kernel 0.936x —
        # C=72 lane waste + per-frame grid cost exceed the transpose copies
        # saved (MODEL_AB_MIXK.json). Git history: 'mix2'/'mix3'/'mixk'.)
        out = frac_shift_axis_select(x, shift[0], _T_AX, st, pt, quantize,
                                     max_shift)
        n, t2, h2, w2, c2 = out.shape
        out = out.reshape(n * t2, h2, w2, c2)
        out = frac_shift_axis_conv(out, shift[1], 1, sh, ph, quantize,
                                   max_shift)
        out = frac_shift_axis_conv(out, shift[2], 2, sw, pw, quantize,
                                   max_shift)
        out = out.reshape(n, t2, out.shape[1], out.shape[2], c2)
    elif backend == "pallas":
        from .pallas.shift_kernel import (
            rubiks_shift3d_pallas, shift3d_pallas_supported,
        )

        strides, pads = (st, sh, sw), (pt, ph, pw)
        if shift3d_pallas_supported(x.shape, strides, pads, max_shift, x.dtype):
            return rubiks_shift3d_pallas(x, shift, max_shift, quantize)
        # Unsupported config (strided, or too large for VMEM): select
        # backend. (ops/pallas/fused_shift3d.py remains available as a
        # strided one-pass formulation but measured slower than select.)
        out = frac_shift_axis_select(x, shift[0], _T_AX, st, pt, quantize, max_shift)
        out = frac_shift_axis_select(out, shift[1], _H_AX, sh, ph, quantize, max_shift)
        out = frac_shift_axis_select(out, shift[2], _W_AX, sw, pw, quantize, max_shift)
    elif backend == "select":
        out = frac_shift_axis_select(x, shift[0], _T_AX, st, pt, quantize, max_shift)
        out = frac_shift_axis_select(out, shift[1], _H_AX, sh, ph, quantize, max_shift)
        out = frac_shift_axis_select(out, shift[2], _W_AX, sw, pw, quantize, max_shift)
    else:
        out = core.frac_shift_axis(x, shift[0], _T_AX, st, pt, quantize)
        out = core.frac_shift_axis(out, shift[1], _H_AX, sh, ph, quantize)
        out = core.frac_shift_axis(out, shift[2], _W_AX, sw, pw, quantize)
    return out


def rubiks_shift_3d_input_grad(
    og, shift, in_shape, stride=(1, 1, 1), padding=(0, 0, 0), quantize=False,
    backend="gather", max_shift=DEFAULT_MAX_SHIFT,
):
    """Gradient w.r.t. x: inverse shift of the upstream gradient.

    Mirrors cuda_src/rubiks3d_kernels.cu:455-929: negate the shifts, gather
    from the strided output grid where coordinates are divisible by the
    stride. Separable per axis like the forward. Non-gather backends use the
    dilated select-unroll formulation (select_backend.py).
    """
    st, sh, sw = _triple(stride)
    pt, ph, pw = _triple(padding)
    shift = shift.astype(og.dtype)
    if backend == "auto":
        from .auto_backend import choose_input_grad_backend

        backend = choose_input_grad_backend(
            og.shape, in_shape, (st, sh, sw), (pt, ph, pw), quantize,
            max_shift, og.dtype,
        )
    if backend == "pallas":
        from .pallas.shift_kernel import (
            rubiks_shift3d_pallas, shift3d_pallas_supported,
        )

        strides, pads = (st, sh, sw), (pt, ph, pw)
        if shift3d_pallas_supported(og.shape, strides, pads, max_shift,
                                    og.dtype) and og.shape == tuple(in_shape):
            # Stride-1 inverse shift = forward shift with negated offsets
            # (cuda_src/rubiks3d_kernels.cu:455-929 without stride gating).
            return rubiks_shift3d_pallas(og, shift, max_shift, quantize,
                                         inverse=True)
    if backend != "gather":
        # Per-axis formulation: strided axes default to the dilated
        # depthwise conv (the select version's interior-dilated pad +
        # slices ran at ~36 GiB/s on the entry blocks' train backward —
        # docs/PERF_NOTES.md round 5); stride-1 axes keep the cheaper
        # select slices. RUBIKS_INPUT_GRAD_TAPS=select/conv overrides.
        impl = os.environ.get("RUBIKS_INPUT_GRAD_TAPS", "auto")

        def inv(y, sc, ax, sstride, spad, din):
            use_conv = (
                impl == "conv"
                or (impl == "auto" and sstride > 1 and spad <= max_shift)
            ) and spad <= max_shift
            if use_conv:
                from .conv_backend import inverse_shift_axis_conv

                return inverse_shift_axis_conv(
                    y, sc, ax, sstride, spad, din, quantize, max_shift)
            return inverse_shift_axis_select(
                y, sc, ax, sstride, spad, din, quantize, max_shift)

        g = inv(og, shift[0], _T_AX, st, pt, in_shape[_T_AX])
        g = inv(g, shift[1], _H_AX, sh, ph, in_shape[_H_AX])
        g = inv(g, shift[2], _W_AX, sw, pw, in_shape[_W_AX])
        return g
    g = core.inverse_shift_axis(og, shift[0], _T_AX, st, pt, in_shape[_T_AX], quantize)
    g = core.inverse_shift_axis(g, shift[1], _H_AX, sh, ph, in_shape[_H_AX], quantize)
    g = core.inverse_shift_axis(g, shift[2], _W_AX, sw, pw, in_shape[_W_AX], quantize)
    return g


def _corrected_taps_select(x, shift_c, axis, stride, padding, d_out, max_shift):
    """Select-backend version of shift_core.corrected_taps (exact-zero
    remainder test, backward-difference corrected small tap)."""
    sf = jnp.floor(shift_c)
    small = sf.astype(jnp.int32)
    r = (shift_c - sf).astype(x.dtype)
    is_int = r == 0
    small_corr = small - is_int.astype(jnp.int32)
    ones = jnp.ones_like(r)
    g_small, g_large = tapped_outputs_select(
        x, axis, stride, padding, d_out,
        [[(small_corr, ones)], [(small + 1, ones)]], max_shift,
    )
    return g_small, g_large, r, is_int


def _corrected_taps_conv(x, shift_c, axis, stride, padding, d_out, max_shift):
    """corrected_taps with the per-channel tap extraction as depthwise
    one-hot convs instead of shared strided slices.

    Identical math to _corrected_taps_select. Exists because XLA lowers the
    select version's stride-s taps as strided W-minor slices running at
    ~31 GiB/s on the stride-2 entry blocks' backward (18% of the Large
    train step — docs/PERF_NOTES.md round 5), while the equivalent strided
    depthwise convs tile properly."""
    from .conv_backend import depthwise_axis_conv

    sf = jnp.floor(shift_c)
    small = sf.astype(jnp.int32)
    r = (shift_c - sf).astype(x.dtype)
    is_int = r == 0
    small_corr = small - is_int.astype(jnp.int32)
    k1 = max_shift + 1
    j = jnp.arange(2 * k1 + 2, dtype=jnp.int32)[:, None] - k1
    w_small = (j == small_corr[None, :]).astype(x.dtype)
    w_large = (j == (small + 1)[None, :]).astype(x.dtype)
    g_small = depthwise_axis_conv(x, w_small, axis, stride, padding, k1)
    g_large = depthwise_axis_conv(x, w_large, axis, stride, padding, k1)
    # The conv produces the canonical output_len; callers may pass a smaller
    # d_out (an upstream gradient of non-canonical shape) — trim to match
    # the select taps' honor-any-d_out contract.
    assert g_small.shape[axis] >= d_out, (g_small.shape, axis, d_out)
    if g_small.shape[axis] > d_out:
        g_small = jax.lax.slice_in_dim(g_small, 0, d_out, axis=axis)
        g_large = jax.lax.slice_in_dim(g_large, 0, d_out, axis=axis)
    return g_small, g_large, r, is_int


def rubiks_shift_3d_shift_grad(
    og, x, shift, stride=(1, 1, 1), padding=(0, 0, 0),
    backend="gather", max_shift=DEFAULT_MAX_SHIFT,
):
    """Raw (un-normalized) gradient w.r.t. the (3, C) shift parameters.

    Implements the plane-difference formulas of
    cuda_src/rubiks3d_kernels.cu:432-441 with the integer-remainder corrected
    corners (ibid. 288-298, 357-431). The corrected corner set factors into
    per-axis "corrected" 1D taps: the small tap moves back one cell whenever
    that axis' remainder is exactly zero. Writing L'_a for the corrected lerp
    along axis a and D_a for the corrected difference (large - small taps):

        d out / d shift_T = L'_W(L'_H(D_T(x)))
        d out / d shift_H = L'_W(D_H(L'_T(x)))
        d out / d shift_W = D_W(L'_H(L'_T(x)))

    each multiplied by the upstream gradient and summed over (N, T, H, W)
    (replacing atomicAdd + addmv_, cuda_src/rubiks.cpp:324-345). Note the
    reference computes shift gradients with these interpolation formulas even
    in quantize mode (the backward kernel takes no quantize flag).
    """
    st, sh, sw = _triple(stride)
    pt, ph, pw = _triple(padding)
    shift = shift.astype(x.dtype)
    to, ho, wo = og.shape[_T_AX], og.shape[_H_AX], og.shape[_W_AX]

    if backend == "auto":
        from .auto_backend import choose_shift_grad_backend

        backend = choose_shift_grad_backend(
            x.shape, og.shape, (st, sh, sw), (pt, ph, pw), max_shift, x.dtype
        )
    if backend == "pallas":
        from .pallas.shift_grad_kernel import (
            rubiks_shift3d_shift_grad_pallas,
            shift_grad_pallas_supported,
        )

        if shift_grad_pallas_supported(
            x.shape, og.shape, (st, sh, sw), (pt, ph, pw), x.dtype, max_shift
        ):
            return rubiks_shift3d_shift_grad_pallas(og, x, shift, max_shift)
        backend = "select"
    if backend == "gather":
        taps = lambda y, sc, ax, sstride, spad, dout: core.corrected_taps(
            y, sc, ax, sstride, spad, dout
        )
    else:
        # Strided configs default to the depthwise-conv tap extraction:
        # stride-s select taps lower to ~31 GiB/s strided slices (the
        # measured entry-block train-backward pathology); stride-1 slices
        # are contiguous and stay on the cheaper select path.
        # RUBIKS_SHIFT_GRAD_TAPS=select/conv overrides for A/B.
        impl = os.environ.get(
            "RUBIKS_SHIFT_GRAD_TAPS",
            "conv" if max(st, sh, sw) > 1 else "select")
        taps_fn = (_corrected_taps_conv if impl == "conv"
                   else _corrected_taps_select)
        taps = lambda y, sc, ax, sstride, spad, dout: taps_fn(
            y, sc, ax, sstride, spad, dout, max_shift
        )

    # Per-axis corrected taps of x along T. Shared by L'_T and D_T.
    at, bt, rt, _ = taps(x, shift[0], _T_AX, st, pt, to)
    rtb = rt.reshape((1, 1, 1, 1, -1))
    u = (1 - rtb) * at + rtb * bt  # L'_T(x)
    v = bt - at  # D_T(x)

    # H-stage taps on u (shared by D_H and L'_H of u) and on v.
    ah_u, bh_u, rh, _ = taps(u, shift[1], _H_AX, sh, ph, ho)
    rhb = rh.reshape((1, 1, 1, 1, -1))
    lh_u = (1 - rhb) * ah_u + rhb * bh_u  # L'_H(L'_T(x))
    dh_u = bh_u - ah_u  # D_H(L'_T(x))
    ah_v, bh_v, _, _ = taps(v, shift[1], _H_AX, sh, ph, ho)
    lh_v = (1 - rhb) * ah_v + rhb * bh_v  # L'_H(D_T(x))

    # W-stage.
    aw_1, bw_1, rw, _ = taps(lh_v, shift[2], _W_AX, sw, pw, wo)
    rwb = rw.reshape((1, 1, 1, 1, -1))
    grad_t_local = (1 - rwb) * aw_1 + rwb * bw_1  # L'_W(L'_H(D_T(x)))
    aw_2, bw_2, _, _ = taps(dh_u, shift[2], _W_AX, sw, pw, wo)
    grad_h_local = (1 - rwb) * aw_2 + rwb * bw_2  # L'_W(D_H(L'_T(x)))
    aw_3, bw_3, _, _ = taps(lh_u, shift[2], _W_AX, sw, pw, wo)
    grad_w_local = bw_3 - aw_3  # D_W(L'_H(L'_T(x)))

    og32 = og
    reduce_axes = (0, 1, 2, 3)
    gt = jnp.sum(og32 * grad_t_local, axis=reduce_axes)
    gh = jnp.sum(og32 * grad_h_local, axis=reduce_axes)
    gw = jnp.sum(og32 * grad_w_local, axis=reduce_axes)
    return jnp.stack([gt, gh, gw], axis=0)  # (3, C)


def normalize_shift_grad_3d(shift_grad, normalize_t_factor):
    """Per-channel unit normalization of the (3, C) shift gradient.

    Matches cuda_src/rubiks3d_kernels.cu:932-960: scale the T gradient by
    normalize_t_factor then L2-normalize the (T, H, W) triple per channel; if
    the factor is negative, keep the raw T gradient and zero H/W; channels
    with zero magnitude pass through unchanged.
    """
    f = float(normalize_t_factor)
    gt, gh, gw = shift_grad[0], shift_grad[1], shift_grad[2]
    if f < 0:
        cur_t, cur_h, cur_w = gt, jnp.zeros_like(gh), jnp.zeros_like(gw)
    else:
        cur_t, cur_h, cur_w = gt * f, gh, gw
    mag = jnp.sqrt(cur_t * cur_t + cur_h * cur_h + cur_w * cur_w)
    safe = jnp.where(mag > 0, mag, jnp.ones_like(mag))
    out = jnp.stack([cur_t, cur_h, cur_w], axis=0) / safe[None, :]
    return jnp.where(mag[None, :] > 0, out, jnp.stack([cur_t, cur_h, cur_w], axis=0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _rubiks_shift_3d_core(
    x, shift, stride, padding, quantize, normalize_grad, normalize_t_factor,
    backend, max_shift,
):
    return rubiks_shift_3d_forward(x, shift, stride, padding, quantize, backend, max_shift)


def _core_fwd(
    x, shift, stride, padding, quantize, normalize_grad, normalize_t_factor,
    backend, max_shift,
):
    out = rubiks_shift_3d_forward(x, shift, stride, padding, quantize, backend, max_shift)
    return out, (x, shift)


def _core_bwd(
    stride, padding, quantize, normalize_grad, normalize_t_factor, backend,
    max_shift, res, og,
):
    x, shift = res
    x_grad = rubiks_shift_3d_input_grad(
        og, shift, x.shape, stride, padding, quantize, backend, max_shift
    )
    shift_grad = rubiks_shift_3d_shift_grad(
        og, x, shift, stride, padding, backend, max_shift
    )
    if normalize_grad:
        shift_grad = normalize_shift_grad_3d(shift_grad, normalize_t_factor)
    return x_grad, shift_grad.astype(shift.dtype)


_rubiks_shift_3d_core.defvjp(_core_fwd, _core_bwd)


def rubiks_shift_3d(
    x,
    shift,
    stride=1,
    padding=0,
    normalize_grad=True,
    normalize_t_factor=1.0,
    quantize=False,
    backend="gather",
    max_shift=DEFAULT_MAX_SHIFT,
):
    """User-facing functional, mirroring the reference signature
    (rubiksnet/shiftlib/rubiks3d/primitive.py:193-219) on channel-last input.

    Args:
      x: (N, T, H, W, C).
      shift: (3, C) learnable shifts.
      normalize_t_factor: float, or "auto" => T / H (primitive.py:206-211).
      backend/max_shift: forward compute path, see rubiks_shift_3d_forward.
    """
    assert x.ndim == 5, "x must be (N, T, H, W, C)"
    if normalize_t_factor == "auto":
        normalize_t_factor = x.shape[_T_AX] / x.shape[_H_AX]
    else:
        assert isinstance(normalize_t_factor, (int, float))
    return _rubiks_shift_3d_core(
        x,
        shift,
        _triple(stride),
        _triple(padding),
        bool(quantize),
        bool(normalize_grad),
        float(normalize_t_factor),
        str(backend),
        int(max_shift),
    )

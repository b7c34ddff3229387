"""Loop-based numpy oracle: a direct transcription of the reference CUDA
kernel semantics (cuda_src/rubiks3d_kernels.cu, cuda_src/rubiks2d_kernels.cu,
host reduction in cuda_src/rubiks.cpp). Used only as the spec for unit tests,
on tiny shapes. Layout follows the CUDA kernels: 3D = (N, T, C, H, W),
2D = (N, C, H, W); tests transpose to/from the TPU-native channel-last layout.
"""

import math

import numpy as np


def _out_len(n, stride, pad):
    return int((n + 2 * pad - 1) / stride) + 1


# ---------------------------------------------------------------- 3D forward
def shift3d_forward(x, shift, stride=(1, 1, 1), padding=(0, 0, 0), quantize=False):
    n, t_in, c, h_in, w_in = x.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    t_out, h_out, w_out = (
        _out_len(t_in, st, pt),
        _out_len(h_in, sh, ph),
        _out_len(w_in, sw, pw),
    )
    out = np.zeros((n, t_out, c, h_out, w_out), dtype=x.dtype)

    def fetch(ni, ti, ci, hi, wi):
        if 0 <= ti < t_in and 0 <= hi < h_in and 0 <= wi < w_in:
            return x[ni, ti, ci, hi, wi]
        return x.dtype.type(0)

    for ni in range(n):
        for to in range(t_out):
            for ci in range(c):
                s_t, s_h, s_w = shift[0, ci], shift[1, ci], shift[2, ci]
                small_t, small_h, small_w = (
                    math.floor(s_t),
                    math.floor(s_h),
                    math.floor(s_w),
                )
                r_t, r_h, r_w = s_t - small_t, s_h - small_h, s_w - small_w
                for ho in range(h_out):
                    for wo in range(w_out):
                        bt = to * st - pt
                        bh = ho * sh - ph
                        bw = wo * sw - pw
                        if quantize:
                            qt = small_t if r_t < 0.5 else small_t + 1
                            qh = small_h if r_h < 0.5 else small_h + 1
                            qw = small_w if r_w < 0.5 else small_w + 1
                            out[ni, to, ci, ho, wo] = fetch(
                                ni, bt + qt, ci, bh + qh, bw + qw
                            )
                            continue
                        acc = 0.0
                        for dt, wt in ((small_t, 1 - r_t), (small_t + 1, r_t)):
                            for dh, wh in ((small_h, 1 - r_h), (small_h + 1, r_h)):
                                for dw, ww in ((small_w, 1 - r_w), (small_w + 1, r_w)):
                                    acc += (
                                        wt
                                        * wh
                                        * ww
                                        * fetch(ni, bt + dt, ci, bh + dh, bw + dw)
                                    )
                        out[ni, to, ci, ho, wo] = acc
    return out


# ------------------------------------------------------ 3D input gradient
def shift3d_input_grad(og, x_shape, shift, stride=(1, 1, 1), padding=(0, 0, 0), quantize=False):
    n, t_in, c, h_in, w_in = x_shape
    st, sh, sw = stride
    pt, ph, pw = padding
    t_out, h_out, w_out = og.shape[1], og.shape[3], og.shape[4]
    gx = np.zeros(x_shape, dtype=og.dtype)

    def fetch_og(ni, ci, jt, jh, jw):
        # strided divisibility gating, C-style % (nonzero iff not divisible)
        if jt % st != 0 or jh % sh != 0 or jw % sw != 0:
            return og.dtype.type(0)
        qt, qh, qw = jt // st, jh // sh, jw // sw
        if 0 <= qt < t_out and 0 <= qh < h_out and 0 <= qw < w_out:
            return og[ni, qt, ci, qh, qw]
        return og.dtype.type(0)

    for ni in range(n):
        for ti in range(t_in):
            for ci in range(c):
                s_t, s_h, s_w = -shift[0, ci], -shift[1, ci], -shift[2, ci]
                small_t, small_h, small_w = (
                    math.floor(s_t),
                    math.floor(s_h),
                    math.floor(s_w),
                )
                r_t, r_h, r_w = s_t - small_t, s_h - small_h, s_w - small_w
                for hi in range(h_in):
                    for wi in range(w_in):
                        ot, oh, ow = ti + pt, hi + ph, wi + pw
                        if quantize:
                            qt = small_t if r_t < 0.5 else small_t + 1
                            qh = small_h if r_h < 0.5 else small_h + 1
                            qw = small_w if r_w < 0.5 else small_w + 1
                            gx[ni, ti, ci, hi, wi] = fetch_og(
                                ni, ci, ot + qt, oh + qh, ow + qw
                            )
                            continue
                        acc = 0.0
                        for dt, wt in ((small_t, 1 - r_t), (small_t + 1, r_t)):
                            for dh, wh in ((small_h, 1 - r_h), (small_h + 1, r_h)):
                                for dw, ww in ((small_w, 1 - r_w), (small_w + 1, r_w)):
                                    acc += (
                                        wt
                                        * wh
                                        * ww
                                        * fetch_og(ni, ci, ot + dt, oh + dh, ow + dw)
                                    )
                        gx[ni, ti, ci, hi, wi] = acc
    return gx


# ------------------------------------------------------ 3D shift gradient
def _interp2d(p11, p12, p21, p22, d1, d2):
    return (
        p11 * (1 - d1) * (1 - d2)
        + p12 * (1 - d1) * d2
        + p21 * d1 * (1 - d2)
        + p22 * d1 * d2
    )


def shift3d_shift_grad(og, x, shift, stride=(1, 1, 1), padding=(0, 0, 0)):
    n, t_in, c, h_in, w_in = x.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    t_out, h_out, w_out = og.shape[1], og.shape[3], og.shape[4]
    grad = np.zeros((3, c), dtype=np.float64)

    def fetch(ni, ti, ci, hi, wi):
        if 0 <= ti < t_in and 0 <= hi < h_in and 0 <= wi < w_in:
            return float(x[ni, ti, ci, hi, wi])
        return 0.0

    for ni in range(n):
        for to in range(t_out):
            for ci in range(c):
                s_t, s_h, s_w = shift[0, ci], shift[1, ci], shift[2, ci]
                small_t, small_h, small_w = (
                    math.floor(s_t),
                    math.floor(s_h),
                    math.floor(s_w),
                )
                r_t, r_h, r_w = s_t - small_t, s_h - small_h, s_w - small_w
                # corrected small taps (backward difference at integer shifts)
                at = small_t - 1 if r_t == 0 else small_t
                ah = small_h - 1 if r_h == 0 else small_h
                aw = small_w - 1 if r_w == 0 else small_w
                lt, lh, lw = small_t + 1, small_h + 1, small_w + 1
                for ho in range(h_out):
                    for wo in range(w_out):
                        bt, bh, bw = to * st - pt, ho * sh - ph, wo * sw - pw

                        def q(dt, dh, dw):
                            return fetch(ni, bt + dt, ci, bh + dh, bw + dw)

                        q111a, q112a = q(at, ah, aw), q(at, ah, lw)
                        q121a, q122a = q(at, lh, aw), q(at, lh, lw)
                        q211a, q212a = q(lt, ah, aw), q(lt, ah, lw)
                        q221a, q222a = q(lt, lh, aw), q(lt, lh, lw)

                        t_small = _interp2d(q111a, q112a, q121a, q122a, r_h, r_w)
                        t_large = _interp2d(q211a, q212a, q221a, q222a, r_h, r_w)
                        h_small = _interp2d(q111a, q112a, q211a, q212a, r_t, r_w)
                        h_large = _interp2d(q121a, q122a, q221a, q222a, r_t, r_w)
                        w_small = _interp2d(q111a, q121a, q211a, q221a, r_t, r_h)
                        w_large = _interp2d(q112a, q122a, q212a, q222a, r_t, r_h)

                        u = float(og[ni, to, ci, ho, wo])
                        grad[0, ci] += (t_large - t_small) * u
                        grad[1, ci] += (h_large - h_small) * u
                        grad[2, ci] += (w_large - w_small) * u
    return grad


def normalize_shift_grad_3d(grad, factor):
    out = grad.copy()
    for ci in range(grad.shape[1]):
        if factor < 0:
            ct, ch, cw = grad[0, ci], 0.0, 0.0
        else:
            ct, ch, cw = grad[0, ci] * factor, grad[1, ci], grad[2, ci]
        mag = math.sqrt(ct * ct + ch * ch + cw * cw)
        if mag > 0:
            out[0, ci], out[1, ci], out[2, ci] = ct / mag, ch / mag, cw / mag
        else:
            out[0, ci], out[1, ci], out[2, ci] = ct, ch, cw
    return out


# ---------------------------------------------------------------- 2D kernels
def _round_fast(v):
    return int(v - 0.5) if v < 0 else int(v + 0.5)


def shift2d_forward(x, shift, stride=(1, 1), padding=(0, 0), quantize=False):
    n, c, h_in, w_in = x.shape
    sh, sw = stride
    ph, pw = padding
    h_out, w_out = _out_len(h_in, sh, ph), _out_len(w_in, sw, pw)
    out = np.zeros((n, c, h_out, w_out), dtype=x.dtype)

    def fetch(ni, ci, hi, wi):
        if 0 <= hi < h_in and 0 <= wi < w_in:
            return x[ni, ci, hi, wi]
        return x.dtype.type(0)

    for ni in range(n):
        for ci in range(c):
            s_h, s_w = shift[0, ci], shift[1, ci]
            small_h, small_w = math.floor(s_h), math.floor(s_w)
            r_h, r_w = s_h - small_h, s_w - small_w
            for ho in range(h_out):
                for wo in range(w_out):
                    bh, bw = ho * sh - ph, wo * sw - pw
                    if quantize:
                        out[ni, ci, ho, wo] = fetch(
                            ni, ci, _round_fast(bh + s_h), _round_fast(bw + s_w)
                        )
                        continue
                    acc = 0.0
                    for dh, wh in ((small_h, 1 - r_h), (small_h + 1, r_h)):
                        for dw, ww in ((small_w, 1 - r_w), (small_w + 1, r_w)):
                            acc += wh * ww * fetch(ni, ci, bh + dh, bw + dw)
                    out[ni, ci, ho, wo] = acc
    return out


def shift2d_input_grad(og, x_shape, shift, stride=(1, 1), padding=(0, 0), quantize=False):
    n, c, h_in, w_in = x_shape
    sh, sw = stride
    ph, pw = padding
    h_out, w_out = og.shape[2], og.shape[3]
    gx = np.zeros(x_shape, dtype=og.dtype)

    def fetch_og(ni, ci, jh, jw):
        if jh % sh != 0 or jw % sw != 0:
            return og.dtype.type(0)
        qh, qw = jh // sh, jw // sw
        if 0 <= qh < h_out and 0 <= qw < w_out:
            return og[ni, ci, qh, qw]
        return og.dtype.type(0)

    for ni in range(n):
        for ci in range(c):
            s_h, s_w = -shift[0, ci], -shift[1, ci]
            small_h, small_w = math.floor(s_h), math.floor(s_w)
            r_h, r_w = s_h - small_h, s_w - small_w
            for hi in range(h_in):
                for wi in range(w_in):
                    oh, ow = hi + ph, wi + pw
                    if quantize:
                        gx[ni, ci, hi, wi] = fetch_og(
                            ni, ci, _round_fast(oh + s_h), _round_fast(ow + s_w)
                        )
                        continue
                    acc = 0.0
                    for dh, wh in ((small_h, 1 - r_h), (small_h + 1, r_h)):
                        for dw, ww in ((small_w, 1 - r_w), (small_w + 1, r_w)):
                            acc += wh * ww * fetch_og(ni, ci, oh + dh, ow + dw)
                    gx[ni, ci, hi, wi] = acc
    return gx


def shift2d_shift_grad(og, x, shift, stride=(1, 1), padding=(0, 0)):
    ZERO_TOL = 1e-7
    n, c, h_in, w_in = x.shape
    sh, sw = stride
    ph, pw = padding
    h_out, w_out = og.shape[2], og.shape[3]
    grad = np.zeros((2, c), dtype=np.float64)

    def fetch(ni, ci, hi, wi):
        if 0 <= hi < h_in and 0 <= wi < w_in:
            return float(x[ni, ci, hi, wi])
        return 0.0

    for ni in range(n):
        for ci in range(c):
            s_h, s_w = shift[0, ci], shift[1, ci]
            small_h, small_w = math.floor(s_h), math.floor(s_w)
            r_h, r_w = s_h - small_h, s_w - small_w
            int_h = ZERO_TOL > r_h > -ZERO_TOL
            int_w = ZERO_TOL > r_w > -ZERO_TOL
            if int_h:
                r_h = 0.0
            if int_w:
                r_w = 0.0
            for ho in range(h_out):
                for wo in range(w_out):
                    bh, bw = ho * sh - ph, wo * sw - pw
                    ih, iw = bh + small_h, bw + small_w

                    def p(dh, dw):
                        return fetch(ni, ci, ih + dh, iw + dw)

                    lh_grad = (1 - r_w) * (p(1, 0) - p(0, 0)) + r_w * (
                        p(1, 1) - p(0, 1)
                    )
                    lw_grad = (1 - r_h) * (p(0, 1) - p(0, 0)) + r_h * (
                        p(1, 1) - p(1, 0)
                    )
                    if int_h:
                        lh_grad = 0.5 * (
                            (1 - r_w) * (p(1, 0) - p(-1, 0))
                            + r_w * (p(1, 1) - p(-1, 1))
                        )
                    if int_w:
                        lw_grad = 0.5 * (
                            (1 - r_h) * (p(0, 1) - p(0, -1))
                            + r_h * (p(1, 1) - p(1, -1))
                        )
                    u = float(og[ni, ci, ho, wo])
                    grad[0, ci] += lh_grad * u
                    grad[1, ci] += lw_grad * u
    return grad


def normalize_shift_grad_2d(grad):
    out = grad.copy()
    for ci in range(grad.shape[1]):
        mag = math.sqrt(grad[0, ci] ** 2 + grad[1, ci] ** 2)
        if mag > 0:
            out[0, ci] /= mag
            out[1, ci] /= mag
    return out

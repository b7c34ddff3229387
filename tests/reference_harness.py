"""Run the REFERENCE torch implementation on CPU for cross-implementation
parity tests.

The reference's Python stack (models.py, backbone.py, attention_shift.py,
shiftlib/*) is imported unmodified from /root/reference; only the compiled
``rubiksnet_cuda`` extension is replaced by a shim whose functions implement
the CUDA kernels' semantics in vectorized numpy (the same 8-corner
gather + trilinear interpolation spec as tests/oracle.py, written in the CUDA
(N, T, C, H, W) layout — NOT the separable per-axis formulation our JAX ops
use, so the two sides stay independent).

Because the reference asserts ``x.is_cuda`` in its host wrappers
(shiftlib/rubiks2d/primitive.py:51, rubiks3d/primitive.py:61) and calls
``.cuda()`` during AQ setup (models.py:100-104), loading the package also
patches ``torch.Tensor.is_cuda``/``.cuda``/``nn.Module.cuda`` to CPU no-ops.
These patches are process-global; they only affect code that ASKS whether a
tensor is on CUDA, which nothing else in this test suite does.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_loaded = None


def _out_len(n, stride, pad):
    return int((n + 2 * pad - 1) / stride) + 1


# ----------------------------------------------------------- vectorized 3D
def shift3d_forward_np(x, shift, strides, paddings, quantize):
    """CUDA-layout (N, T, C, H, W) trilinear shift forward
    (cuda_src/rubiks3d_kernels.cu:15-205), vectorized 8-corner gather."""
    n, t, c, h, w = x.shape
    st, sh, sw = strides
    pt, ph, pw = paddings
    to, ho, wo = _out_len(t, st, pt), _out_len(h, sh, ph), _out_len(w, sw, pw)
    sT, sH, sW = shift[0], shift[1], shift[2]
    kT, kH, kW = (np.floor(s).astype(np.int64) for s in (sT, sH, sW))
    rT, rH, rW = sT - np.floor(sT), sH - np.floor(sH), sW - np.floor(sW)
    bt = np.arange(to) * st - pt
    bh = np.arange(ho) * sh - ph
    bw = np.arange(wo) * sw - pw
    I_n = np.arange(n)[:, None, None, None, None]
    I_c = np.arange(c)[None, None, :, None, None]

    def gather(Ti, Hi, Wi):
        # Ti (to,c), Hi (ho,c), Wi (wo,c) absolute input coords; OOB -> 0.
        ok = (
            ((Ti >= 0) & (Ti < t))[None, :, :, None, None]
            & ((Hi >= 0) & (Hi < h)).T[None, None, :, :, None]
            & ((Wi >= 0) & (Wi < w)).T[None, None, :, None, :]
        )
        g = x[
            I_n,
            Ti.clip(0, t - 1)[None, :, :, None, None],
            I_c,
            Hi.clip(0, h - 1).T[None, None, :, :, None],
            Wi.clip(0, w - 1).T[None, None, :, None, :],
        ]
        return np.where(ok, g, x.dtype.type(0))

    if quantize:
        qT = kT + (rT >= 0.5)
        qH = kH + (rH >= 0.5)
        qW = kW + (rW >= 0.5)
        return gather(
            bt[:, None] + qT[None, :],
            bh[:, None] + qH[None, :],
            bw[:, None] + qW[None, :],
        )

    out = np.zeros((n, to, c, ho, wo), x.dtype)
    for dt, wt in ((kT, 1 - rT), (kT + 1, rT)):
        for dh, wh in ((kH, 1 - rH), (kH + 1, rH)):
            for dw, ww in ((kW, 1 - rW), (kW + 1, rW)):
                wgt = (wt * wh * ww).astype(x.dtype)
                out += wgt[None, None, :, None, None] * gather(
                    bt[:, None] + dt[None, :],
                    bh[:, None] + dh[None, :],
                    bw[:, None] + dw[None, :],
                )
    return out


# ----------------------------------------------------------- vectorized 2D
def shift2d_forward_np(x, shift, strides, paddings, quantize):
    """CUDA-layout (N, C, H, W) bilinear shift forward
    (cuda_src/rubiks2d_kernels.cu:94-145); quantize uses round_fast
    (half away from zero) applied to base+shift, per kernel lines 76-82."""
    n, c, h, w = x.shape
    sh_, sw_ = strides
    ph_, pw_ = paddings
    ho, wo = _out_len(h, sh_, ph_), _out_len(w, sw_, pw_)
    sH, sW = shift[0], shift[1]
    kH, kW = np.floor(sH).astype(np.int64), np.floor(sW).astype(np.int64)
    rH, rW = sH - np.floor(sH), sW - np.floor(sW)
    bh = np.arange(ho) * sh_ - ph_
    bw = np.arange(wo) * sw_ - pw_
    I_n = np.arange(n)[:, None, None, None]
    I_c = np.arange(c)[None, :, None, None]

    def gather(Hi, Wi):
        # Hi (ho,c), Wi (wo,c)
        ok = (
            ((Hi >= 0) & (Hi < h)).T[None, :, :, None]
            & ((Wi >= 0) & (Wi < w)).T[None, :, None, :]
        )
        g = x[
            I_n,
            I_c,
            Hi.clip(0, h - 1).T[None, :, :, None],
            Wi.clip(0, w - 1).T[None, :, None, :],
        ]
        return np.where(ok, g, x.dtype.type(0))

    if quantize:
        def round_fast(v):
            return np.where(v < 0, np.ceil(v - 0.5), np.floor(v + 0.5)).astype(
                np.int64
            )

        return gather(
            round_fast(bh[:, None] + sH[None, :]),
            round_fast(bw[:, None] + sW[None, :]),
        )

    out = np.zeros((n, c, ho, wo), x.dtype)
    for dh, wh in ((kH, 1 - rH), (kH + 1, rH)):
        for dw, ww in ((kW, 1 - rW), (kW + 1, rW)):
            wgt = (wh * ww).astype(x.dtype)
            out += wgt[None, :, None, None] * gather(
                bh[:, None] + dh[None, :], bw[:, None] + dw[None, :]
            )
    return out


# ------------------------------------------------------- torchvision shim
def _make_torchvision_shim():
    """Minimal torchvision.transforms shim — torchvision is not installed in
    this environment, and the reference's transforms.py uses only
    ``transforms.Resize`` and ``transforms.CenterCrop`` (its eval scripts add
    ``transforms.Compose``). Semantics follow torchvision's documented PIL
    behavior: int Resize = shorter-side bilinear resize (no-op when the
    shorter side already matches), CenterCrop with rounded offsets."""
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR):
            self.size, self.interpolation = size, interpolation

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if (w <= h and w == self.size) or (h <= w and h == self.size):
                    return img
                if w < h:
                    return img.resize(
                        (self.size, int(self.size * h / w)), self.interpolation
                    )
                return img.resize(
                    (int(self.size * w / h), self.size), self.interpolation
                )
            return img.resize(tuple(self.size)[::-1], self.interpolation)

    class CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, img):
            w, h = img.size
            th, tw = self.size
            x1 = int(round((w - tw) / 2.0))
            y1 = int(round((h - th) / 2.0))
            return img.crop((x1, y1, x1 + tw, y1 + th))

    tr.Compose, tr.Resize, tr.CenterCrop = Compose, Resize, CenterCrop
    tr.Scale = Resize
    tv.transforms = tr
    return tv, tr


# --------------------------------------------------------------- the shim
def _make_rubiksnet_cuda_shim():
    import oracle  # loop transcription of the CUDA kernels (tests/oracle.py)
    import torch

    mod = types.ModuleType("rubiksnet_cuda")

    def _np(t):
        return t.detach().cpu().numpy()

    def _fill(dst, src):
        dst.copy_(torch.from_numpy(np.ascontiguousarray(src)).to(dst.dtype))
        return 0

    def fwd3d(x, shift, strides, paddings, quantize, output):
        return _fill(
            output,
            shift3d_forward_np(_np(x), _np(shift), strides, paddings, quantize),
        )

    def bwd3d(
        x, shift, upstream, strides, paddings, x_grad, shift_grad,
        normalize_grad, normalize_t_factor, quantize,
    ):
        og, xn, sn = _np(upstream), _np(x), _np(shift)
        strides, paddings = tuple(strides), tuple(paddings)
        xg = oracle.shift3d_input_grad(og, xn.shape, sn, strides, paddings, quantize)
        sg = oracle.shift3d_shift_grad(og, xn, sn, strides, paddings)
        if normalize_grad:
            sg = oracle.normalize_shift_grad_3d(sg, normalize_t_factor)
        x_grad.add_(torch.from_numpy(xg).to(x_grad.dtype))
        shift_grad.add_(torch.from_numpy(sg).to(shift_grad.dtype))
        return 0

    def fwd2d(input, shift, strides, paddings, quantize, output):
        return _fill(
            output,
            shift2d_forward_np(_np(input), _np(shift), tuple(strides),
                               tuple(paddings), quantize),
        )

    def bwd2d(
        upstream_grad, input, shift, strides, paddings, normalize_grad,
        enable_shift_grad, quantize, input_grad, shift_grad,
    ):
        og, xn, sn = _np(upstream_grad), _np(input), _np(shift)
        strides, paddings = tuple(strides), tuple(paddings)
        xg = oracle.shift2d_input_grad(og, xn.shape, sn, strides, paddings, quantize)
        input_grad.add_(torch.from_numpy(xg).to(input_grad.dtype))
        if enable_shift_grad:
            sg = oracle.shift2d_shift_grad(og, xn, sn, strides, paddings)
            if normalize_grad:
                sg = oracle.normalize_shift_grad_2d(sg)
            shift_grad.add_(torch.from_numpy(sg).to(shift_grad.dtype))
        return 0

    mod.rubiks_shift_3d_forward_float = fwd3d
    mod.rubiks_shift_3d_forward_double = fwd3d
    mod.rubiks_shift_3d_backward_float = bwd3d
    mod.rubiks_shift_3d_backward_double = bwd3d
    mod.rubiks2d_forward = fwd2d
    mod.rubiks2d_backward = bwd2d
    return mod


def load_reference():
    """Import the reference `rubiksnet` package with the CUDA extension
    shimmed and CPU tensors masquerading as CUDA. Returns the package."""
    global _loaded
    if _loaded is not None:
        return _loaded
    import torch

    sys.modules.setdefault("rubiksnet_cuda", _make_rubiksnet_cuda_shim())
    if "torchvision" not in sys.modules:
        tv, tr = _make_torchvision_shim()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    torch.Tensor.is_cuda = property(lambda self: True)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import rubiksnet  # noqa: F401
    import rubiksnet.models  # noqa: F401

    _loaded = rubiksnet
    return _loaded

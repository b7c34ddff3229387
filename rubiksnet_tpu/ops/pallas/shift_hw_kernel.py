"""One-pass per-frame H/W fractional-shift Pallas kernel.

Role: the H/W half of the separable 3D shift for stages whose whole clip
does not fit VMEM (Large stage0: 112x112x72). The `mix` fallback
(ops/shift3d.py) computes those taps as two per-frame depthwise convs, and
XLA's layout assignment transposes the whole activation around each conv
(W-minor for the H conv, N-minor for the W conv — 4 transpose copies per
block, measured ~11% of the Large forward; docs/PERF_NOTES.md round 5).
H/W taps never cross frames, so this kernel runs per frame with no halo
exchange: one read, the tap math on an f32 VMEM scratch, one write — in
whatever layout the neighbors use.

Math is identical to conv_backend._shift_kernel's taps (the shared spec of
cuda_src/rubiks3d_kernels.cu:15-205's H/W interpolation): per channel,
out[h, w] = sum_{jh, jw} wH[jh] wW[jw] x[h + jh - K, w + jw - K] with zero
out-of-bounds fill. Stride-1 / pad-0 only (strided entry blocks have their
own fused kernel, ops/pallas/fused_entry.py).

Mosaic notes: tap arithmetic runs in f32 (bf16 odd-offset sublane value
slices are miscompiled on this runtime — see ops/pallas/fused_block.py);
the padded scratch is zeroed once at grid step 0 and its halo is never
written, providing the zero fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv_backend import _shift_kernel

_VMEM_BUDGET = 96 * 1024 * 1024
_VMEM_LIMIT_CAP = 120 * 1024 * 1024


def _sub(dtype) -> int:
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _geometry(h, w, c, max_shift, dtype):
    k = max_shift
    taps = 2 * k + 2
    hp = h + taps - 1  # padded rows per frame (halo k lo, k+1 hi)
    # Padded width covers every W tap window [j, j + w); f32 scratch tile.
    wp = _round_up(w + taps - 1, _sub(jnp.float32))
    wo = _round_up(w, _sub(dtype))  # block width as seen by the pipeline
    return k, taps, hp, wp, wo


def _vmem_bytes(h, w, c, max_shift, dtype, g) -> int:
    k, taps, hp, wp, wo = _geometry(h, w, c, max_shift, dtype)
    cp = _round_up(c, 128)
    item = jnp.dtype(dtype).itemsize
    pbuf = g * hp * wp * cp * 4
    io = 2 * 2 * g * h * w * cp * item  # double-buffered in+out blocks
    temps = 2 * hp * wp * cp * 4 + 2 * h * wp * cp * 4
    return pbuf + io + temps


def pick_group(n_frames, h, w, c, max_shift, dtype) -> int:
    for g in (8, 4, 2, 1):
        if n_frames % g == 0 and _vmem_bytes(h, w, c, max_shift, dtype,
                                             g) <= _VMEM_BUDGET:
            return g
    return 0


def shift_hw_pallas_supported(shape, stride, padding, max_shift,
                              dtype) -> bool:
    """shape: (N, T, H, W, C) or (F, H, W, C)."""
    if tuple(stride)[-2:] != (1, 1) or tuple(padding)[-2:] != (0, 0):
        return False
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    h, w, c = shape[-3], shape[-2], shape[-1]
    frames = 1
    for d in shape[:-3]:
        frames *= d
    return pick_group(frames, h, w, c, max_shift, dtype) >= 1


def _kernel(x_ref, wt_ref, out_ref, pbuf, *, g, h, w, k, taps, hp, wp,
            out_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        # Halo regions (never written afterwards) must read as zeros.
        pbuf[...] = jnp.zeros_like(pbuf)

    f32 = jnp.float32
    c = out_ref.shape[-1]
    for f in range(g):
        pbuf[pl.ds(f * hp + k, h), k : k + w, :] = (
            x_ref[pl.ds(f * h, h)].astype(f32)
        )
    for f in range(g):
        fr = pbuf[pl.ds(f * hp, hp)]
        u = None
        for j in range(taps):
            term = wt_ref[1, j, :].reshape(1, 1, c) * fr[:, j : j + w, :]
            u = term if u is None else u + term
        o = None
        for j in range(taps):
            term = wt_ref[0, j, :].reshape(1, 1, c) * u[j : j + h]
            o = term if o is None else o + term
        out_ref[pl.ds(f * h, h)] = o.astype(out_dtype)


def shift_hw_pallas(x, shift_h, shift_w, max_shift, quantize=False,
                    interpret=None):
    """Apply the per-channel fractional H/W shift to (..., H, W, C).

    Leading dims are flattened into a frame axis. Stride 1, padding 0.
    """
    *lead, h, w, c = x.shape
    frames = 1
    for d in lead:
        frames *= d
    g = pick_group(frames, h, w, c, max_shift, x.dtype)
    assert g >= 1, (x.shape, max_shift)
    k, taps, hp, wp, wo = _geometry(h, w, c, max_shift, x.dtype)

    wt = jnp.stack([
        _shift_kernel(shift_h.astype(x.dtype), x.dtype, max_shift, quantize),
        _shift_kernel(shift_w.astype(x.dtype), x.dtype, max_shift, quantize),
    ]).astype(jnp.float32)  # (2, taps, C)

    x3 = x.reshape(frames * h, w, c)
    kernel = functools.partial(
        _kernel, g=g, h=h, w=w, k=k, taps=taps, hp=hp, wp=wp,
        out_dtype=x.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(frames // g,),
        in_specs=[
            pl.BlockSpec((g * h, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, taps, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g * h, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames * h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((g * hp, wp, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_vmem_bytes(h, w, c, max_shift, x.dtype, g) * 1.3),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * taps * frames * hp * wp * c,
            bytes_accessed=2 * x3.size * x3.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(x3, wt)
    return out.reshape(*lead, h, w, c)

"""One-pass Pallas TPU kernel for the stride-1 3D fractional shift.

The op-level production kernel replacing the separable XLA formulations for
the (dominant) stride-1 zero-padding configuration: 78 of the 83 shift
layers in RubiksNet-Large are stride 1. One HBM read + one HBM write per
tensor instead of three depthwise-conv round trips.

Shares the fused-block kernel's layout rules (ops/pallas/fused_block.py):
(rows, W, C) buffers with C on lanes, (t', h) row blocking so temporal taps
are whole-slab row shifts, W-axis taps once per halo frame, tap arithmetic
in f32 (this runtime miscompiles odd-offset sublane slices of bf16 values).

Because the reference's input gradient is the *inverse* shift (negated
offsets with stride gating, cuda_src/rubiks3d_kernels.cu:455-929) and the
stride is 1 here, the same kernel also serves the training backward's
input-gradient: pass tap weights built from the negated shifts.

Covers forward + input-grad; the (3, C) shift-gradient reduction stays in
XLA (ops/shift3d.py) — it is a different contraction shape, not a shift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv_backend import _shift_kernel
from .fused_block import (
    _VMEM_BUDGET,
    _VMEM_LIMIT_CAP,
    _geometry,
    _round_up,
)

# Shapes too large for the whole-clip schedule fall back to other backends
# (an unrolled per-frame fori hangs this runtime's Mosaic; see
# fused_frames.py for the grid-phase alternative). Kept as a local toggle
# for interpret-mode coverage of the per-frame schedule.
_PER_FRAME_ROWS = 1 << 30


def _shift_vmem_bytes(shape, max_shift, dtype, group) -> int:
    n, t, h, w, c = shape
    k, sub, wp, tp, hp, wph = _geometry(t, h, w, c, max_shift, dtype)
    itemsize = jnp.dtype(dtype).itemsize
    cp = _round_up(c, 128)
    g = group
    cbuf = g * tp * hp * wph * cp * itemsize
    wbuf = g * tp * hp * wp * cp * itemsize
    io_blocks = 2 * 2 * g * t * h * wp * cp * itemsize
    if h * wp >= _PER_FRAME_ROWS:
        temps = 2 * hp * wph * cp * 4 + 2 * hp * wp * cp * 4
    else:
        temps = 2 * hp * wph * cp * 4 + 2 * t * hp * wp * cp * 4
    return cbuf + wbuf + io_blocks + temps


def shift3d_pallas_supported(shape, stride, padding, max_shift, dtype) -> bool:
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (0, 0, 0):
        return False
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return _pick_group(shape, max_shift, dtype) >= 1


def _pick_group(shape, max_shift, dtype) -> int:
    n = shape[0]
    for g in (2, 1):
        if n % g == 0 and _shift_vmem_bytes(shape, max_shift, dtype, g) <= _VMEM_BUDGET:
            return g
    return 0


def _kernel(
    x_ref, tw_ref, out_ref, cbuf, wbuf,
    *, g_len, t_len, h_len, w_len, c, k, wp, tp, hp, wph, out_dtype,
):
    i = pl.program_id(0)
    taps_n = 2 * k + 2
    th = t_len * h_len
    fhp = tp * hp
    f32 = jnp.float32
    per_frame = h_len * wp >= _PER_FRAME_ROWS
    u_len = t_len * hp
    v_len = u_len - 2 * k - 1

    @pl.when(i == 0)
    def _zero_halo():
        cbuf[...] = jnp.zeros_like(cbuf)

    def clip_body(g, _):
        base = g * th
        cbase = g * fhp
        # Scatter the input into the zero-padded halo buffer.
        for t in range(t_len):
            cbuf[pl.ds(cbase + (k + t) * hp + k, h_len), k : k + w_len, :] = (
                x_ref[pl.ds(base + t * h_len, h_len), :, :]
            )
        # W-axis taps once per halo frame.
        for tt in range(tp):
            cc = cbuf[pl.ds(cbase + tt * hp, hp)].astype(f32)
            wv = None
            for j in range(taps_n):
                term = tw_ref[2 * taps_n + j, :].reshape(1, 1, c) * (
                    cc[:, j : j + wp, :]
                )
                wv = term if wv is None else wv + term
            wbuf[pl.ds(cbase + tt * hp, hp)] = wv.astype(out_dtype)
        # T then H taps; per-frame for large frames, whole-clip otherwise.
        if per_frame:
            for t in range(t_len):
                u = None
                for j in range(taps_n):
                    term = tw_ref[j, :].reshape(1, 1, c) * (
                        wbuf[pl.ds(cbase + (t + j) * hp, hp)].astype(f32)
                    )
                    u = term if u is None else u + term
                v = None
                for j in range(taps_n):
                    term = tw_ref[taps_n + j, :].reshape(1, 1, c) * (
                        u[j : j + h_len]
                    )
                    v = term if v is None else v + term
                out_ref[pl.ds(base + t * h_len, h_len), :, :] = (
                    v[:, :w_len, :].astype(out_dtype)
                )
        else:
            u = None
            for j in range(taps_n):
                term = tw_ref[j, :].reshape(1, 1, c) * (
                    wbuf[pl.ds(cbase + j * hp, u_len)].astype(f32)
                )
                u = term if u is None else u + term
            v = None
            for j in range(taps_n):
                term = tw_ref[taps_n + j, :].reshape(1, 1, c) * (
                    u[j : j + v_len]
                )
                v = term if v is None else v + term
            v3 = v.astype(out_dtype)
            for t in range(t_len):
                out_ref[pl.ds(base + t * h_len, h_len), :, :] = (
                    v3[t * hp : t * hp + h_len, :w_len, :]
                )
        return 0

    jax.lax.fori_loop(0, g_len, clip_body, 0)


def shift3d_taps(shift, dtype, max_shift, quantize=False, inverse=False):
    """(3*(2K+2), C) f32 tap-weight stack for the kernel.

    inverse=True builds the input-gradient taps (negated shifts — the
    stride-1 case of the reference's inverse-shift backward)."""
    shift = shift.astype(dtype)
    if inverse:
        shift = -shift
    return jnp.concatenate([
        _shift_kernel(shift[0], dtype, max_shift, quantize),
        _shift_kernel(shift[1], dtype, max_shift, quantize),
        _shift_kernel(shift[2], dtype, max_shift, quantize),
    ]).astype(jnp.float32)


def rubiks_shift3d_pallas(x, shift, max_shift, quantize=False, inverse=False,
                          interpret=None):
    """Stride-1, padding-0 3D shift (or its inverse) in one pass.

    x: (N, T, H, W, C); shift: (3, C). Caller guards with
    shift3d_pallas_supported."""
    n, t_len, h_len, w_len, c = x.shape
    k, sub, wp, tp, hp, wph = _geometry(t_len, h_len, w_len, c, max_shift,
                                        x.dtype)
    g_len = _pick_group(x.shape, max_shift, x.dtype)
    if g_len < 1:
        raise ValueError(f"shapes too large for VMEM: {x.shape}")
    th = t_len * h_len
    tw = shift3d_taps(shift, x.dtype, max_shift, quantize, inverse)
    x3 = x.reshape(n * th, w_len, c)
    kernel = functools.partial(
        _kernel,
        g_len=g_len, t_len=t_len, h_len=h_len, w_len=w_len, c=c, k=k,
        wp=wp, tp=tp, hp=hp, wph=wph, out_dtype=x.dtype,
    )
    taps_n = 2 * k + 2
    out = pl.pallas_call(
        kernel,
        grid=(n // g_len,),
        in_specs=[
            pl.BlockSpec((g_len * th, w_len, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_len * th, w_len, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * th, w_len, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g_len * tp * hp, wph, c), x.dtype),
            pltpu.VMEM((g_len * tp * hp, wp, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_shift_vmem_bytes(x.shape, max_shift, x.dtype,
                                          g_len) * 1.3),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * 3 * taps_n * 2 * th * wph * c,
            bytes_accessed=2 * x3.size * x3.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(x3, tw)
    return out.reshape(n, t_len, h_len, w_len, c)

"""Fused Pallas TPU kernel for the 3D fractional shift forward pass.

The separable XLA backends (gather / conv / select, see ../shift_core.py,
../select_backend.py) materialize an intermediate tensor per axis and re-read
the input once per unrolled tap, so they are HBM-bound at many passes over
the activation. This kernel performs all three per-axis shifts in one pass:

  HBM -> VMEM:  one contiguous DMA per (clip, H-tile) of a halo window of the
                padded input
  VMEM:         T taps, H taps, W taps applied as per-channel weighted sums
                of statically (strided-)shifted slices — VPU work at VMEM
                bandwidth
  VMEM -> HBM:  one write of the output tile

Per-channel tap weights (the same (2K+2, C) one-hot-lerp matrices as the conv
backend) are computed outside the kernel and live in VMEM.

The axon/Mosaic runtime on this v5e faults the TPU worker for several
otherwise-legal constructs (established by bisection): sliced DMAs with
non-128-aligned lane extents, non-contiguous (multi-dim-sliced or rank>4)
manual DMAs, multi-dim-partitioned output BlockSpecs, and 2-D grids combined
with manual DMA. The kernel therefore works entirely in rank-3:

  * padded input laid out H-major and flattened to (N*Hp*Tp, Wp, Cp): an
    (n, H-tile) halo window is a single contiguous row-range;
  * all VMEM buffers and slices are rank-3; T-tap and output-interleave
    access is expressed as static strided row slices;
  * output written as (N*H_out*T_out, W_out, Cp) blocks partitioned along
    rows only, grid 1-D; reshaped/transposed back to (N, T, H, W, C) outside.

Supported: stride (1, s, s) with equal H/W stride, padding 0, any dtype,
quantize (half-up) — exactly the configurations the RubiksNet model uses
(rubiksnet/models.py:132-136). The public op falls back to the select
backend for anything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv_backend import _shift_kernel
from ..shift_core import output_len

# conservative VMEM budget for the input halo buffer + output block
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_tile(h_out: int, s_h: int, taps: int, tp: int, bytes_per_row: int,
               out_bytes_per_row: int) -> int:
    """Largest divisor of h_out whose buffers fit the VMEM budget."""
    divisors = sorted(
        (d for d in range(1, h_out + 1) if h_out % d == 0), reverse=True
    )
    for d in divisors:
        hw_in = (d - 1) * s_h + taps
        need = hw_in * tp * bytes_per_row + 2 * d * out_bytes_per_row
        if need <= _VMEM_BUDGET:
            return d
    return 1


def _kernel(
    wt_ref, wh_ref, ww_ref, xp_ref, out_ref, buf, sem,
    *, taps, t_out, hp, tp, th, hw_in, wp, w_out, c, s_h, s_w, n_h,
):
    g = pl.program_id(0)
    n = g // n_h
    hb = g % n_h
    row0 = (n * hp + hb * th * s_h) * tp
    dma = pltpu.make_async_copy(
        xp_ref.at[pl.ds(row0, hw_in * tp)],  # one contiguous row range
        buf,
        sem,
    )
    dma.start()
    dma.wait()

    h_span = (th - 1) * s_h + 1
    w_span = (w_out - 1) * s_w + 1

    def w_at(ref, j):
        return ref[j, :].reshape(1, 1, c)

    for t in range(t_out):
        # T stage: buffer rows are (h, t') interleaved with period tp;
        # tap j of output frame t lives at rows (t + j) :: tp.
        a = None
        for j in range(taps):
            rows = buf[t + j : t + j + (hw_in - 1) * tp + 1 : tp]
            term = w_at(wt_ref, j) * rows
            a = term if a is None else a + term
        # H stage: strided window over the halo rows.
        b = None
        for j in range(taps):
            term = w_at(wh_ref, j) * a[j : j + h_span : s_h]
            b = term if b is None else b + term
        # W stage.
        o = None
        for j in range(taps):
            term = w_at(ww_ref, j) * b[:, j : j + w_span : s_w]
            o = term if o is None else o + term
        # Output rows are (h, t) interleaved with period t_out.
        out_ref[t : t + (th - 1) * t_out + 1 : t_out] = o


def fused_shift3d_supported(shape, stride, padding, max_shift) -> bool:
    st, sh, sw = stride
    if st != 1 or sh != sw or padding != (0, 0, 0):
        return False
    n, t, h, w, c = shape
    h_out = output_len(h, sh, 0)
    w_out = output_len(w, sw, 0)
    k = max_shift
    # padded extents must cover the input (no negative high padding)
    if (h_out - 1) * sh + 2 * k + 2 < h + k:
        return False
    if (w_out - 1) * sw + 2 * k + 2 < w + k:
        return False
    return True


def rubiks_shift_3d_fused(x, shift, stride, padding, quantize, max_shift):
    """Fused forward. Caller must check fused_shift3d_supported first.

    Runs the Pallas kernel in interpret mode off-TPU so tests exercise the
    same code path on CPU."""
    st, sh, sw = stride
    assert st == 1 and sh == sw and padding == (0, 0, 0)
    n, t_in, h_in, w_in, c = x.shape
    k = max_shift
    taps = 2 * k + 2
    t_out = t_in
    h_out = output_len(h_in, sh, 0)
    w_out = output_len(w_in, sw, 0)

    # 128-align the channel (lane) extent inside the same pad op; the
    # sublane (W) extents of all DMA'd buffers must be aligned to the dtype
    # tile (8 for f32, 16 for bf16) or the runtime faults.
    cp = -(-c // 128) * 128
    sub = 16 if jnp.dtype(x.dtype).itemsize == 2 else 8
    shift = shift.astype(x.dtype)
    shift_p = jnp.pad(shift, ((0, 0), (0, cp - c)))
    wt = _shift_kernel(shift_p[0], x.dtype, k, quantize)  # (taps, Cp)
    wh = _shift_kernel(shift_p[1], x.dtype, k, quantize)
    ww = _shift_kernel(shift_p[2], x.dtype, k, quantize)

    tp = t_in + 2 * k + 1
    hp = (h_out - 1) * sh + 2 * k + 2
    w_out_p = -(-w_out // sub) * sub  # sublane-aligned output W
    wp = (w_out_p - 1) * sw + 2 * k + 2
    wp = -(-wp // sub) * sub
    # H-major padded layout (N, Hp, Tp, Wp, Cp), flattened to rank 3.
    xt = jnp.transpose(x, (0, 2, 1, 3, 4))  # (N, H, T, W, C)
    xp = lax.pad(
        xt,
        jnp.zeros((), x.dtype),
        [
            (0, 0, 0),
            (k, hp - h_in - k, 0),
            (k, tp - t_in - k, 0),
            (k, wp - w_in - k, 0),
            (0, cp - c, 0),
        ],
    )
    xp3 = xp.reshape(n * hp * tp, wp, cp)

    itemsize = jnp.dtype(x.dtype).itemsize
    bytes_per_row = wp * cp * itemsize
    out_bytes_per_row = t_out * w_out * cp * itemsize
    th = _pick_tile(h_out, sh, taps, tp, bytes_per_row, out_bytes_per_row)
    hw_in = (th - 1) * sh + taps
    n_h = h_out // th

    kernel = functools.partial(
        _kernel,
        taps=taps, t_out=t_out, hp=hp, tp=tp, th=th, hw_in=hw_in, wp=wp,
        w_out=w_out_p, c=cp, s_h=sh, s_w=sw, n_h=n_h,
    )

    out = pl.pallas_call(
        kernel,
        grid=(n * n_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ww
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp3 stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (th * t_out, w_out_p, cp), lambda g: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n * h_out * t_out, w_out_p, cp), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((hw_in * tp, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(wt, wh, ww, xp3)
    out = out.reshape(n, h_out, t_out, w_out_p, cp)
    out = jnp.transpose(out, (0, 2, 1, 3, 4))
    return out[:, :, :, :w_out, :c]

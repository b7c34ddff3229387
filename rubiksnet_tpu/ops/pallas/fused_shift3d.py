"""Fused Pallas TPU kernel for the 3D fractional shift forward pass.

The separable XLA backends (gather / conv / select, see ../shift_core.py,
../select_backend.py) materialize an intermediate tensor per axis and re-read
the input once per unrolled tap, so they are HBM-bound at many passes over
the activation. This kernel performs all three per-axis shifts in one pass:

  HBM -> VMEM:  T+2K+1 contiguous row-range DMAs per (clip, H-tile), loading
                a (T-halo x H-halo x W x C) window of the padded input
  VMEM:         T taps, H taps, W taps applied as per-channel weighted sums
                of statically shifted slices (VPU work at VMEM bandwidth)
  VMEM -> HBM:  one contiguous write of the output tile

Per-channel tap weights (the same (2K+2, C) one-hot-lerp matrices as the conv
backend) are computed outside the kernel and live in VMEM.

Mosaic/axon runtime constraints dictated the structure (violations either
fault the TPU worker or fail compilation; established by bisection on v5e):
  * DMA'd buffers need 128-aligned lane and 8/16-aligned sublane extents;
  * manual DMAs must be contiguous row ranges of a rank-3 ref;
  * output BlockSpecs partitioned along a single dim only, 1-D grid;
  * ALL strided vector slices are rejected at verification ("expected
    strides to be confined to [1, 2)" — scripts/mosaic_probe.py), so every
    in-kernel slice must be unit-stride: the halo buffer is laid out in
    (t', h) blocks (one contiguous DMA per padded frame) making T taps
    block slices and H/W taps stride-1 slices; output tile rows are ordered
    (t, h) so writes are contiguous.
  * Spatially strided (s=2) configs therefore use strided-slice-FREE
    decimation (both constructs probed OK on-chip): the padded input is
    W-DE-INTERLEAVED by XLA outside the kernel (halves [E | O]; tap j of
    the decimated output reads unit-stride slice [j//2, j//2+W_out) of half
    j%2, since source col 2q+j = 2(q + j//2) + j%2), and the H decimation
    splits the untiled major row dim with a layout-preserving rank-4
    reshape + a unit-stride parity slice.

Supported: stride (1, s, s) with equal H/W stride s in {1, 2}, padding 0,
quantize (half-up). The public op falls back to the select backend for
anything else.
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
    wt_ref, wh_ref, ww_ref, xp_ref, out_ref, buf, sems,
    *, taps, t_out, hp, tp, th, hw_in, wp, w_out, c, s_h, s_w, n_h, whp=0,
):
    g = pl.program_id(0)
    n = g // n_h
    hb = g % n_h
    h0 = hb * th * s_h
    # One contiguous DMA per padded frame t' into the (t', h) blocked buffer.
    for tpi in range(tp):
        pltpu.make_async_copy(
            xp_ref.at[pl.ds((n * tp + tpi) * hp + h0, hw_in)],
            buf.at[pl.ds(tpi * hw_in, hw_in)],
            sems.at[tpi],
        ).start()
    for tpi in range(tp):
        pltpu.make_async_copy(
            xp_ref.at[pl.ds((n * tp + tpi) * hp + h0, hw_in)],
            buf.at[pl.ds(tpi * hw_in, hw_in)],
            sems.at[tpi],
        ).wait()

    h_span = (th - 1) * s_h + 1
    w_span = (w_out - 1) * s_w + 1

    # Tap arithmetic in (at least) f32: Mosaic on this runtime miscompiles
    # odd-offset sublane slices of bf16 *values* (see fused_block.py); f32
    # slices are exact. f64 inputs (interpret-mode tests) stay f64.
    f32 = jnp.promote_types(out_ref.dtype, jnp.float32)

    def w_at(ref, j):
        return ref[j, :].astype(f32).reshape(1, 1, c)

    for t in range(t_out):
        # T stage: contiguous frame blocks of the halo buffer.
        a = None
        for j in range(taps):
            rows = buf[(t + j) * hw_in : (t + j + 1) * hw_in].astype(f32)
            term = w_at(wt_ref, j) * rows
            a = term if a is None else a + term
        # H stage (contiguous for s_h == 1; parity split for s_h == 2 —
        # Mosaic here rejects all strided slices, so source row 2r + j is
        # read as half j%2, half-row r + j//2 of a major-dim reshape-split).
        b = None
        if s_h == 1:
            for j in range(taps):
                rows = lax.slice_in_dim(a, j, j + h_span, axis=0)
                term = w_at(wh_ref, j) * rows
                b = term if b is None else b + term
        else:
            a4 = a.reshape(hw_in // 2, 2, a.shape[1], c)
            for j in range(taps):
                rows = a4[:, j % 2][j // 2:j // 2 + th]
                term = w_at(wh_ref, j) * rows
                b = term if b is None else b + term
        # W stage (for s_w == 2 the buffer columns are de-interleaved
        # [E | O] halves of width whp: source col 2q + j = half j%2, index
        # q + j//2 — unit-stride slices only).
        o = None
        if s_w == 1:
            for j in range(taps):
                cols = lax.slice_in_dim(b, j, j + w_span, axis=1)
                term = w_at(ww_ref, j) * cols
                o = term if o is None else o + term
        else:
            for j in range(taps):
                base = (whp if j % 2 else 0) + j // 2
                cols = b[:, base:base + w_out]
                term = w_at(ww_ref, j) * cols
                o = term if o is None else o + term
        # Output tile rows ordered (t, h): contiguous write.
        out_ref[t * th : (t + 1) * th] = o.astype(out_ref.dtype)


def fused_shift3d_supported(shape, stride, padding, max_shift, dtype) -> bool:
    st, sh, sw = stride
    if st != 1 or sh != sw or padding != (0, 0, 0):
        return False
    if sh not in (1, 2):
        return False  # strided-slice-free decimation exists only for s=2
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

    # 128-align the channel (lane) extent and sublane-align W inside the same
    # pad op (unaligned DMA extents fault the runtime).
    cp = -(-c // 128) * 128
    sub = 16 if jnp.dtype(x.dtype).itemsize == 2 else 8
    shift = shift.astype(x.dtype)
    shift_p = jnp.pad(shift, ((0, 0), (0, cp - c)))
    wt = _shift_kernel(shift_p[0], x.dtype, k, quantize)  # (taps, Cp)
    wh = _shift_kernel(shift_p[1], x.dtype, k, quantize)
    ww = _shift_kernel(shift_p[2], x.dtype, k, quantize)

    tp = t_in + 2 * k + 1
    hp = (h_out - 1) * sh + 2 * k + 2
    w_out_p = -(-w_out // sub) * sub
    if sw == 2:
        # De-interleaved layout: two aligned halves of width whp; tap j of
        # the decimated output reads half j%2 at [j//2, j//2 + w_out_p).
        whp = -(-(k + w_out_p + 1) // sub) * sub
        wp = 2 * whp
    else:
        whp = 0
        wp = (w_out_p - 1) * sw + 2 * k + 2
        wp = -(-wp // sub) * sub
    # Natural NTHWC pad (no input transpose), flattened to rank 3.
    xp = lax.pad(
        x,
        jnp.zeros((), x.dtype),
        [
            (0, 0, 0),
            (k, tp - t_in - k, 0),
            (k, hp - h_in - k, 0),
            (k, wp - w_in - k, 0),
            (0, cp - c, 0),
        ],
    )
    if sw == 2:
        # XLA-side W de-interleave (strided slices are only illegal inside
        # the kernel): padded col m -> half m%2, index m//2.
        xp = jnp.concatenate([xp[..., 0::2, :], xp[..., 1::2, :]], axis=3)
    xp3 = xp.reshape(n * tp * hp, wp, cp)

    itemsize = jnp.dtype(x.dtype).itemsize
    bytes_per_row = wp * cp * itemsize
    out_bytes_per_row = t_out * w_out_p * cp * itemsize
    th = _pick_tile(h_out, sh, taps, tp, bytes_per_row, out_bytes_per_row)
    hw_in = (th - 1) * sh + taps
    n_h = h_out // th

    kernel = functools.partial(
        _kernel,
        taps=taps, t_out=t_out, hp=hp, tp=tp, th=th, hw_in=hw_in, wp=wp,
        w_out=w_out_p, c=cp, s_h=sh, s_w=sw, n_h=n_h, whp=whp,
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
            (t_out * th, w_out_p, cp), lambda g: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n * n_h * t_out * th, w_out_p, cp), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((tp * hw_in, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA((tp,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(wt, wh, ww, xp3)
    # (N, n_h, T, th, Wp, Cp) -> (N, T, H_out, W_out, C)
    out = out.reshape(n, n_h, t_out, th, w_out_p, cp)
    out = jnp.transpose(out, (0, 2, 1, 3, 4, 5)).reshape(
        n, t_out, h_out, w_out_p, cp
    )
    return out[:, :, :, :w_out, :c]

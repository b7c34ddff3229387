"""Fused multi-block Pallas TPU kernel: conv -> shift -> conv chains in VMEM.

This is the TPU replacement for the role the reference's CUDA kernels played
as the *production* inference path (cuda_src/rubiks3d_kernels.cu:15-205 did
the shift; the adjacent 1x1 convolutions of rubiksnet/backbone.py:109-135
were separate cuDNN calls). On TPU the network is HBM-bandwidth-bound: the
unfused XLA graph makes ~15 full passes over the activation tensor per block
(BN, two 1x1-conv matmuls, three depthwise-conv shift stages, shortcut add).
This kernel executes an entire run of stride-1 identity-shortcut blocks

    x_{b+1} = x_b + W3_b @ shift3d(relu(bn2_b(W2_b @ relu(bn1_b(x_b)))))

with the activation resident in VMEM for the whole run:

  grid = (clips, blocks), block index minor. The clip's activation lives in a
  VMEM scratch accumulator across all block steps; per-block weights stream
  through double-buffered BlockSpec pipelines. HBM traffic per clip per run
  is ONE activation read + ONE activation write + the (small) weights,
  instead of ~15 passes per block.

Inside one block step:
  * bn1+relu on the accumulator (VPU),
  * 1x1 conv as one (T*H*Wp, C) x (C, C) MXU matmul in f32 accumulation,
  * bn2+relu fused on the matmul result,
  * the 3-axis fractional shift as per-axis tap sums over a zero-padded halo
    scratch (the same (2K+2, C) one-hot-lerp tap weights as conv_backend),
  * second 1x1 conv matmul, shortcut add into the accumulator.

Layout notes (Mosaic/axon rules, see ops/pallas/fused_shift3d.py):
  * all buffers are rank-3 (rows, W, C) with C on lanes; W is padded to the
    sublane tile (8 f32 / 16 bf16) so (rows, Wp, C) <-> (rows*Wp, C)
    reshapes around the matmuls are layout-preserving (free);
  * every in-kernel slice is stride-1 (bf16-safe); halo zeros come from a
    once-zeroed scratch whose halo region is never written;
  * no manual DMAs: HBM<->VMEM movement is BlockSpec-pipelined, which also
    gives input/weight prefetch overlap for free.

Batch-norm parameters arrive pre-folded for inference (scale/bias); see
stack_block_params.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv_backend import _shift_kernel

# Leave headroom under the ~16 MB/core VMEM for pipeline double-buffers.
_VMEM_BUDGET = 13 * 1024 * 1024
_BN_EPS = 1e-5


def _sub(dtype) -> int:
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _geometry(t, h, w, c, max_shift, dtype):
    k = max_shift
    sub = _sub(dtype)
    wp = _round_up(w, sub)
    tp = t + 2 * k + 1
    hp = h + 2 * k + 1
    wph = _round_up(w + 2 * k + 1, sub)
    return k, sub, wp, tp, hp, wph


def fused_block_vmem_bytes(shape, max_shift, dtype) -> int:
    """Estimated VMEM need: scratch + pipelined in/out blocks (x2 each)."""
    n, t, h, w, c = shape
    k, sub, wp, tp, hp, wph = _geometry(t, h, w, c, max_shift, dtype)
    itemsize = jnp.dtype(dtype).itemsize
    acc = t * h * wp * c * itemsize
    cbuf = tp * hp * wph * c * itemsize
    dbuf = t * h * wp * c * itemsize
    io_blocks = 2 * 2 * t * h * w * c * itemsize
    weight_blocks = 2 * 2 * c * c * itemsize
    matmul_tmp = t * h * wp * c * 4  # f32 matmul result
    return acc + cbuf + dbuf + io_blocks + weight_blocks + matmul_tmp


def fused_block_supported(shape, max_shift, dtype) -> bool:
    n, t, h, w, c = shape
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return fused_block_vmem_bytes(shape, max_shift, dtype) <= _VMEM_BUDGET


def _kernel(
    x_ref, vecs_ref, taps_ref, w2_ref, w3_ref, out_ref, acc, cbuf, dbuf,
    *, t_len, h_len, w_len, c, k, wp, tp, hp, wph, out_dtype,
):
    n = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    taps_n = 2 * k + 2
    th = t_len * h_len

    @pl.when(jnp.logical_and(n == 0, b == 0))
    def _zero_halo():
        # The halo region of cbuf must read as true zeros (the shift's
        # out-of-bounds fill). It is never written afterwards; the interior
        # is fully overwritten every step.
        cbuf[...] = jnp.zeros_like(cbuf)
        acc[...] = jnp.zeros_like(acc)
        dbuf[...] = jnp.zeros_like(dbuf)

    @pl.when(b == 0)
    def _load():
        if wp > w_len:
            acc[:, :w_len, :] = x_ref[...]
        else:
            acc[...] = x_ref[...]

    f32 = jnp.float32
    bn1_s = vecs_ref[0, 0, :].astype(acc.dtype).reshape(1, 1, c)
    bn1_b = vecs_ref[0, 1, :].astype(acc.dtype).reshape(1, 1, c)
    bn2_s = vecs_ref[0, 2, :].reshape(1, c)
    bn2_b = vecs_ref[0, 3, :].reshape(1, c)

    a = jnp.maximum(acc[...] * bn1_s + bn1_b, 0)
    av = a.reshape(th * wp, c)
    bm = jnp.dot(av, w2_ref[0], preferred_element_type=f32)
    cm = jnp.maximum(bm * bn2_s + bn2_b, 0).astype(acc.dtype)
    c3 = cm.reshape(th, wp, c)

    # Scatter the valid region into the zero-padded halo buffer, rows laid
    # out (t', h) so temporal taps are whole-frame row blocks.
    for t in range(t_len):
        cbuf[(k + t) * hp + k : (k + t) * hp + k + h_len, k : k + w_len, :] = (
            c3[t * h_len : (t + 1) * h_len, :w_len, :]
        )

    wt = taps_ref[0, 0]  # (taps, C)
    wh = taps_ref[0, 1]
    ww = taps_ref[0, 2]
    for t in range(t_len):
        u = None
        for j in range(taps_n):
            term = wt[j].reshape(1, 1, c) * cbuf[(t + j) * hp : (t + j + 1) * hp]
            u = term if u is None else u + term
        v = None
        for j in range(taps_n):
            term = wh[j].reshape(1, 1, c) * u[j : j + h_len]
            v = term if v is None else v + term
        d = None
        for j in range(taps_n):
            term = ww[j].reshape(1, 1, c) * v[:, j : j + w_len, :]
            d = term if d is None else d + term
        dbuf[t * h_len : (t + 1) * h_len, :w_len, :] = d

    dv = dbuf[...].reshape(th * wp, c)
    e = jnp.dot(dv, w3_ref[0], preferred_element_type=f32)
    acc[...] = acc[...] + e.reshape(th, wp, c).astype(acc.dtype)

    @pl.when(b == nb - 1)
    def _flush():
        out_ref[...] = acc[:, :w_len, :].astype(out_dtype)


def fused_block_run(x, vecs, taps, w2, w3, *, max_shift, interpret=None):
    """Apply a chain of B fused blocks to a clip batch.

    Args:
      x: (N, T, H, W, C) activation (bf16 or f32).
      vecs: (B, 4, C) f32 — folded bn1 scale/bias, bn2 scale/bias.
      taps: (B, 3, 2K+2, C) x.dtype — per-axis shift tap weights
        (conv_backend._shift_kernel layout: tap j <-> offset j - K).
      w2, w3: (B, C, C) x.dtype — 1x1 conv kernels (in, out).
      max_shift: static K bound on the integer part of the shifts.

    Returns (N, T, H, W, C), equal to applying the B blocks sequentially.
    """
    n, t_len, h_len, w_len, c = x.shape
    nb = vecs.shape[0]
    k, sub, wp, tp, hp, wph = _geometry(t_len, h_len, w_len, c, max_shift, x.dtype)
    taps_n = 2 * k + 2
    assert taps.shape == (nb, 3, taps_n, c), (taps.shape, (nb, 3, taps_n, c))
    assert w2.shape == (nb, c, c) and w3.shape == (nb, c, c)
    th = t_len * h_len

    x3 = x.reshape(n * th, w_len, c)
    kernel = functools.partial(
        _kernel,
        t_len=t_len, h_len=h_len, w_len=w_len, c=c, k=k,
        wp=wp, tp=tp, hp=hp, wph=wph, out_dtype=x.dtype,
    )
    flops_per_step = 2 * 2 * th * wp * c * c + 3 * (2 * k + 2) * 2 * th * wph * c
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((th, w_len, c), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, taps_n, c), lambda i, b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, w_len, c), lambda i, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * th, w_len, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th, wp, c), x.dtype),       # accumulator (the clip)
            pltpu.VMEM((tp * hp, wph, c), x.dtype),  # shift halo buffer
            pltpu.VMEM((th, wp, c), x.dtype),       # shifted output
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * nb * flops_per_step,
            bytes_accessed=2 * x3.size * x3.dtype.itemsize
            + n * nb * 2 * c * c * jnp.dtype(x.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None else interpret,
    )(x3, vecs, taps, w2, w3)
    return out.reshape(n, t_len, h_len, w_len, c)


def fold_bn(gamma, beta, mean, var, eps=_BN_EPS):
    """Inference-time batch-norm folding: y = scale * x + bias."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def stack_block_params(block_params, block_stats, dtype, max_shift,
                       quantize=False):
    """Stack a run of RubiksShiftBlock param/stat subtrees into the fused
    kernel's (vecs, taps, w2, w3) arrays.

    block_params/block_stats: lists of the per-block 'params' /'batch_stats'
    subtrees as produced by nn/backbone.py (keys bn1, conv2, bn2,
    as3/rubiks3d/shift, conv3).
    """
    vecs, taps, w2s, w3s = [], [], [], []
    for p, s in zip(block_params, block_stats):
        s1, b1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                         s["bn1"]["mean"], s["bn1"]["var"])
        s2, b2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                         s["bn2"]["mean"], s["bn2"]["var"])
        vecs.append(jnp.stack([s1, b1, s2, b2]).astype(jnp.float32))
        shift = p["as3"]["rubiks3d"]["shift"].astype(dtype)
        taps.append(jnp.stack([
            _shift_kernel(shift[0], dtype, max_shift, quantize),
            _shift_kernel(shift[1], dtype, max_shift, quantize),
            _shift_kernel(shift[2], dtype, max_shift, quantize),
        ]))
        c = shift.shape[-1]
        w2s.append(p["conv2"]["kernel"].reshape(c, c).astype(dtype))
        w3s.append(p["conv3"]["kernel"].reshape(c, c).astype(dtype))
    return (jnp.stack(vecs), jnp.stack(taps).astype(dtype),
            jnp.stack(w2s), jnp.stack(w3s))

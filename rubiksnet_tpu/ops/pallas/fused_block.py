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

  grid = (clip groups, blocks), block index minor. The group's activation
  lives in a VMEM scratch accumulator across all block steps; per-block
  weights stream through double-buffered BlockSpec pipelines. HBM traffic per
  clip per run is ONE activation read + ONE activation write + the (small)
  weights, instead of ~15 passes per block. Grouping several clips per grid
  step amortizes the fixed per-step cost (measured ~10us on v5e).

Inside one block step, per clip, the schedule is:
  * pass 1 (per frame): bn1+relu on the accumulator (VPU), 1x1 conv as an
    (H*Wp, C) x (C, C) MXU matmul with f32 accumulation, bn2+relu on the
    result, scatter into the zero-padded halo buffer;
  * pass 1.5 (per halo frame): the W-axis shift taps, computed ONCE per
    input frame (W comes first because its result is shared by every
    output frame and narrows the working width for the T/H stages — ~30%
    fewer tap ops than T-first ordering);
  * pass 2 (per frame): T-axis taps over whole-frame row blocks, H-axis
    taps over row windows, then the second 1x1-conv MXU matmul and the
    shortcut add into the accumulator.

Layout notes (Mosaic/axon rules, see ops/pallas/fused_shift3d.py):
  * all buffers are rank-3/4 (..., rows, W, C) with C on lanes; W is padded
    to the sublane tile (8 f32 / 16 bf16) so (rows, Wp, C) <-> (rows*Wp, C)
    reshapes around the matmuls are layout-preserving (free);
  * tap arithmetic runs in f32: Mosaic on this runtime miscompiles
    odd-offset sublane slices of bf16 *values* (established by on-chip
    bisection; f32 slices are exact) — and the VPU is f32-native anyway;
  * halo zeros come from a once-zeroed scratch whose halo region is never
    written; no manual DMAs — HBM<->VMEM movement is BlockSpec-pipelined,
    which also gives input/weight prefetch overlap for free.

Batch-norm parameters arrive pre-folded for inference (scale/bias); see
stack_block_params.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv_backend import _shift_kernel

# v5e exposes ~128 MB of VMEM to a kernel (verified empirically on this
# runtime: 120 MB scratch compiles and runs); the 16 MB figure is only the
# compiler's default scoped budget, which we raise via vmem_limit_bytes.
_VMEM_BUDGET = 96 * 1024 * 1024
_VMEM_LIMIT_CAP = 120 * 1024 * 1024
_BN_EPS = 1e-5
# Clips too large for this whole-clip schedule are handled by the per-frame
# grid-phase kernel in fused_frames.py (an unrolled per-frame fori here sent
# this runtime's Mosaic into an apparently unbounded compile; grid iteration
# does not — bisected on-chip 2026-08-17).


def _sub(dtype) -> int:
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _geometry(t, h, w, c, max_shift, dtype, sdtype=None):
    k = max_shift
    sub = _sub(dtype)
    wp = _round_up(w, sub)
    tp = t + 2 * k + 1
    hp = h + 2 * k + 1
    # The W-tap stage slices [j : j + wp] for j in [0, 2k+2), so the halo
    # width must cover wp + 2k + 1 (the tail is zero, never written). The
    # halo buffer lives in the scratch dtype, whose sublane tile sets the
    # rounding (f32 scratch: 8 -> narrower halo than bf16's 16).
    wph = _round_up(wp + 2 * k + 1, _sub(sdtype if sdtype is not None
                                         else dtype))
    return k, sub, wp, tp, hp, wph


def _group_vmem_bytes(shape, max_shift, dtype, group: int,
                      _scratch_f32: bool = False, aq: bool = False) -> int:
    """Estimated VMEM need for `group` clips per grid step, using Mosaic's
    padded layouts: lanes (channels) padded to 128, sublanes (W) to the
    dtype tile, for scratch and pipeline buffers alike."""
    n, t, h, w, c = shape
    sdtype = jnp.float32 if _scratch_f32 else dtype
    k, sub, wp, tp, hp, wph = _geometry(t, h, w, c, max_shift, dtype, sdtype)
    itemsize = jnp.dtype(dtype).itemsize
    sitem = jnp.dtype(sdtype).itemsize
    cp = _round_up(c, 128)
    g = group
    acc = g * t * h * wp * cp * itemsize
    cbuf = g * tp * hp * wph * cp * sitem
    wbuf = g * tp * hp * wp * cp * sitem
    abuf = g * (t + 2) * h * wp * cp * itemsize if aq else 0
    io_blocks = 2 * 2 * g * t * h * wp * cp * itemsize  # double-buffered io
    weight_blocks = 2 * 2 * cp * cp * itemsize
    # Whole-clip schedule: matmul results + T/H tap stages for the
    # full clip + one halo frame of the W stage.
    temps = (2 * t * h * wp * cp * 4 + 2 * t * hp * wp * cp * 4
             + 2 * hp * wph * cp * 4)
    return acc + cbuf + wbuf + abuf + io_blocks + weight_blocks + temps


def fused_block_vmem_bytes(shape, max_shift, dtype, aq=False) -> int:
    return _group_vmem_bytes(shape, max_shift, dtype, 1, aq=aq)


def pick_group(shape, max_shift, dtype, aq=False) -> int:
    """Largest group size (divisor of N, <= RUBIKS_FUSED_GROUP, default 8)
    whose buffers fit VMEM.

    Grouping clips per grid step amortizes the fixed per-step cost (weight
    (re)fetch + pipeline bubbles): small-frame stages run thousands of tiny
    steps otherwise (e.g. Large stage3 = 35 blocks x N/g groups). The clip
    loop is a fori_loop, so group size does not grow the compiled kernel."""
    n = shape[0]
    gmax = int(os.environ.get("RUBIKS_FUSED_GROUP", "8"))
    g = 1 << min(gmax, n).bit_length() - 1  # largest power of two <= min
    while g >= 1:
        if n % g == 0 and _group_vmem_bytes(shape, max_shift, dtype, g,
                                            aq=aq) <= _VMEM_BUDGET:
            return g
        g //= 2
    return 0


def pick_scratch_dtype(shape, max_shift, dtype, group, aq=False):
    """Use f32 tap scratch when it fits: removes every bf16<->f32 conversion
    in the tap stages and narrows the halo width (f32 sublane tile is 8)."""
    if jnp.dtype(dtype).itemsize >= 4:
        return dtype
    if _group_vmem_bytes(shape, max_shift, dtype, group,
                         _scratch_f32=True, aq=aq) <= _VMEM_BUDGET:
        return jnp.float32
    return dtype


def fused_block_supported(shape, max_shift, dtype, aq=False) -> bool:
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return pick_group(shape, max_shift, dtype, aq=aq) >= 1


def _kernel_no_se(x_ref, vt_ref, wm_ref, out_ref, acc, cbuf, wbuf, abuf,
                  **kw):
    _kernel(x_ref, vt_ref, wm_ref, None, out_ref, acc, cbuf, wbuf, abuf,
            **kw)


def _kernel(
    x_ref, vt_ref, wm_ref, se_ref, out_ref, acc, cbuf, wbuf, abuf,
    *, g_len, t_len, h_len, w_len, c, k, taps_n, wp, tp, hp, wph, out_dtype,
    aq=False, mxu_taps=False, se_batch=False,
):
    i = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    th = t_len * h_len
    f32 = jnp.float32

    @pl.when(jnp.logical_and(i == 0, b == 0))
    def _zero_halo():
        # The halo region of cbuf must read as true zeros (the shift's
        # out-of-bounds fill). It is never written afterwards; the interior
        # is fully overwritten every step. wbuf's temporal halo frames
        # (below k and above k + t_len) are zeroed once too, so the W-tap
        # pass only has to process the t_len frames that carry data.
        cbuf[...] = jnp.zeros_like(cbuf)
        wbuf[...] = jnp.zeros_like(wbuf)
        acc[...] = jnp.zeros_like(acc)
        if aq:
            abuf[...] = jnp.zeros_like(abuf)

    @pl.when(b == 0)
    def _load():
        if wp > w_len:
            acc[:, :w_len, :] = x_ref[...]
        else:
            acc[...] = x_ref[...]

    bn1_s = vt_ref[0, 0, :].astype(acc.dtype).reshape(1, 1, c)
    bn1_b = vt_ref[0, 1, :].astype(acc.dtype).reshape(1, 1, c)
    bn2_s = vt_ref[0, 2, :].reshape(1, c)
    bn2_b = vt_ref[0, 3, :].reshape(1, c)
    w2 = wm_ref[0, 0]
    w3 = wm_ref[0, 1]
    w3f = w3.astype(f32) if mxu_taps else None
    fhp = tp * hp  # halo rows per clip

    # Clips iterate via fori_loop (dynamic row bases) so the compiled kernel
    # body stays one clip's worth of code regardless of the group size. All
    # compute inside is expressed as whole-clip ops (one matmul per conv per
    # clip; each tap as one big shifted-slice multiply-add) — per-op fixed
    # costs dominate small-frame stages otherwise.
    u_len = t_len * hp
    v_len = u_len - 2 * k - 1  # frame t's valid rows: [t*hp, t*hp + h)

    def se_gate(v_frame):
        """Squeeze-excitation gate (1, c) for one frame's shifted activation
        (backbone.py SELayer: spatial mean, fc-relu-fc, sigmoid)."""
        m = jnp.sum(v_frame[:, :w_len, :], axis=(0, 1)).reshape(1, c) * (
            1.0 / (h_len * w_len)
        )
        y1 = jnp.maximum(
            jnp.dot(m, se_ref[0, 0], preferred_element_type=f32), 0
        )
        y2 = jax.lax.dot_general(
            y1, se_ref[0, 1],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        return jax.nn.sigmoid(y2)

    def se_conv3_batched(v):
        """Batched SE + conv3 over the whole clip: one stacked gate matmul
        pair for all t_len frames and ONE conv3 matmul, instead of per-frame
        matmuls (t_len small MXU issues per clip per block add up: Large
        stage3 = 64 clips x 8 frames x 35 blocks of ~200-row matmuls).

        v: (v_len, wp, c) shifted activation (frame t's valid rows at
        [t*hp, t*hp + h_len)); gates apply to the inter-frame garbage rows
        too, which is harmless — they are dropped at extraction (the last
        frame's span is h_len rows, not hp, so the parts sum to v_len)."""
        ms = [
            jnp.sum(
                v[t * hp : t * hp + h_len, :w_len, :], axis=(0, 1)
            ).reshape(1, c)
            for t in range(t_len)
        ]
        m = jnp.concatenate(ms, axis=0) * (1.0 / (h_len * w_len))
        y1 = jnp.maximum(
            jnp.dot(m, se_ref[0, 0], preferred_element_type=f32), 0
        )
        y2 = jax.lax.dot_general(
            y1, se_ref[0, 1],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        gates = jax.nn.sigmoid(y2)  # (t_len, c)
        parts = [
            v[t * hp : ((t + 1) * hp if t < t_len - 1 else v_len)]
            * gates[t].reshape(1, 1, c)
            for t in range(t_len)
        ]
        vg = jnp.concatenate(parts, axis=0).astype(acc.dtype)
        e = jnp.dot(vg.reshape(v_len * wp, c), w3,
                    preferred_element_type=f32)
        return e.reshape(v_len, wp, c).astype(acc.dtype)

    def aq_mix(a_full, abase):
        """3-tap attention temporal shift over the activated clip: the
        packed (t, h) row layout makes 'frame t+-1' a row shift by h_len
        (zero boundary frames from the once-zeroed abuf halo)."""
        abuf[pl.ds(abase + h_len, th)] = a_full.astype(acc.dtype)
        mixed = None
        for j in range(3):
            term = vt_ref[0, 4 + 3 * taps_n + j, :].reshape(1, 1, c) * (
                abuf[pl.ds(abase + j * h_len, th)].astype(f32)
            )
            mixed = term if mixed is None else mixed + term
        return mixed.astype(acc.dtype)

    def clip_body(g, _):
        base = g * th
        cbase = g * fhp
        abase = g * (t_len + 2) * h_len
        # Pass 1: bn1+relu, [AQ attention temporal shift], 1x1-conv matmul,
        # bn2+relu, scatter the valid region into the zero-padded halo
        # buffer, rows laid out (t', h) so temporal taps are whole-slab row
        # shifts. Small frames batch the whole clip into one matmul; big
        # frames go one frame at a time to bound the f32 temporaries.
        a = jnp.maximum(acc[pl.ds(base, th)] * bn1_s + bn1_b, 0)
        if aq:
            a = aq_mix(a, abase)
        bm = jnp.dot(a.reshape(th * wp, c), w2,
                     preferred_element_type=f32)
        cm = jnp.maximum(bm * bn2_s + bn2_b, 0).astype(cbuf.dtype)
        c3 = cm.reshape(th, wp, c)
        for t in range(t_len):
            cbuf[pl.ds(cbase + (k + t) * hp + k, h_len),
                 k : k + w_len, :] = c3[t * h_len : (t + 1) * h_len,
                                        :w_len, :]

        # Pass 1.5: W-axis taps, once per data frame (shared by every output
        # frame of the temporal taps below). The k halo frames on each side
        # stay zero from the one-time wbuf zeroing — a zero frame's W taps
        # are zero, so recomputing them every block was pure waste.
        for tt in range(k, k + t_len):
            cc = cbuf[pl.ds(cbase + tt * hp, hp)].astype(f32)
            wv = None
            for j in range(taps_n):
                term = vt_ref[0, 4 + 2 * taps_n + j, :].reshape(1, 1, c) * (
                    cc[:, j : j + wp, :]
                )
                wv = term if wv is None else wv + term
            wbuf[pl.ds(cbase + tt * hp, hp)] = wv.astype(wbuf.dtype)

        # Pass 2: T taps as row shifts by j*hp (the (t', h) row layout makes
        # "frame t+j" a pure row offset), H taps as row shifts by j, then the
        # second 1x1-conv matmul and the shortcut add into acc.
        if mxu_taps:
            # MXU tap folding: each of the T/H tap stages is a per-channel
            # scaling of row-shifted slabs, i.e. a matmul against a diagonal
            # matrix — so the two stages chain as
            #   u1 = Σ_l wbuf[rows + l*hp] @ diag(twT_l)          (T axis)
            #   v  = Σ_j u1[rows + j] @ diag(twH_j)               (H axis)
            # and without SE the H stage folds straight into conv3:
            #   e  = Σ_j u1[rows + j] @ (diag(twH_j) W3).
            # That moves 2/3 of the tap multiply-adds from the VPU (the
            # measured bottleneck, ~15x slower than MXU at stage2 shapes)
            # onto the MXU for 2*(2K+2) extra matmuls per block — the
            # factored form, not the (2K+2)^2 pair products, so the extra
            # MXU FLOPs stay ~4x conv3 at K=1. Scaled/diagonal weights are
            # built in-kernel (tiny VPU cost) so HBM weight traffic stays
            # two matrices per block. AQ's temporal taps are identity, so
            # the T stage disappears there. With SE, v is materialized via
            # diagonal matmuls, gated per frame (the gate is a per-frame
            # spatial mean), then fed to per-frame conv3 matmuls.
            if aq:
                u1 = wbuf[pl.ds(cbase + k * hp, u_len)].astype(acc.dtype)
            else:
                eye = (
                    jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
                ).astype(f32)
                u_acc = None
                for l in range(taps_n):
                    d = (eye * vt_ref[0, 4 + l, :].reshape(1, c)).astype(
                        acc.dtype
                    )
                    u_l = wbuf[pl.ds(cbase + l * hp, u_len)].astype(
                        acc.dtype
                    )
                    term = jnp.dot(u_l.reshape(u_len * wp, c), d,
                                   preferred_element_type=f32)
                    u_acc = term if u_acc is None else u_acc + term
                u1 = u_acc.reshape(u_len, wp, c).astype(acc.dtype)
            if se_ref is None:
                e_acc = None
                for j in range(taps_n):
                    w3s = (w3f * vt_ref[0, 4 + taps_n + j, :].reshape(c, 1)
                           ).astype(acc.dtype)
                    term = jnp.dot(
                        u1[j : j + v_len].reshape(v_len * wp, c), w3s,
                        preferred_element_type=f32,
                    )
                    e_acc = term if e_acc is None else e_acc + term
                e3 = e_acc.reshape(v_len, wp, c).astype(acc.dtype)
                for t in range(t_len):
                    rows = pl.ds(base + t * h_len, h_len)
                    acc[rows] = acc[rows] + e3[t * hp : t * hp + h_len]
            else:
                eye_h = (
                    jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
                ).astype(f32)
                v_acc = None
                for j in range(taps_n):
                    d = (eye_h * vt_ref[0, 4 + taps_n + j, :].reshape(1, c)
                         ).astype(acc.dtype)
                    term = jnp.dot(
                        u1[j : j + v_len].reshape(v_len * wp, c), d,
                        preferred_element_type=f32,
                    )
                    v_acc = term if v_acc is None else v_acc + term
                v3 = v_acc.reshape(v_len, wp, c)
                if se_batch:
                    e3 = se_conv3_batched(v3)
                    for t in range(t_len):
                        rows = pl.ds(base + t * h_len, h_len)
                        acc[rows] = acc[rows] + e3[t * hp : t * hp + h_len]
                else:
                    for t in range(t_len):
                        v_t = v3[t * hp : t * hp + h_len]
                        v_t = v_t * se_gate(v_t).reshape(1, 1, c)
                        e = jnp.dot(
                            v_t.astype(acc.dtype).reshape(h_len * wp, c), w3,
                            preferred_element_type=f32,
                        )
                        rows = pl.ds(base + t * h_len, h_len)
                        acc[rows] = acc[rows] + e.reshape(
                            h_len, wp, c
                        ).astype(acc.dtype)
        else:
            # Whole-clip big ops: the few inter-frame garbage rows (hp vs h)
            # ride through the matmul and are dropped at extraction.
            if aq:
                # AQ's spatial shift is 2D: temporal taps are identity.
                u = wbuf[pl.ds(cbase + k * hp, u_len)].astype(f32)
            else:
                u = None
                for j in range(taps_n):
                    term = vt_ref[0, 4 + j, :].reshape(1, 1, c) * (
                        wbuf[pl.ds(cbase + j * hp, u_len)].astype(f32)
                    )
                    u = term if u is None else u + term
            v = None
            for j in range(taps_n):
                term = vt_ref[0, 4 + taps_n + j, :].reshape(1, 1, c) * (
                    u[j : j + v_len]
                )
                v = term if v is None else v + term
            if se_ref is None:
                e = jnp.dot(v.astype(acc.dtype).reshape(v_len * wp, c), w3,
                            preferred_element_type=f32)
                e3 = e.reshape(v_len, wp, c).astype(acc.dtype)
                for t in range(t_len):
                    rows = pl.ds(base + t * h_len, h_len)
                    acc[rows] = acc[rows] + e3[t * hp : t * hp + h_len]
            elif se_batch:
                e3 = se_conv3_batched(v)
                for t in range(t_len):
                    rows = pl.ds(base + t * h_len, h_len)
                    acc[rows] = acc[rows] + e3[t * hp : t * hp + h_len]
            else:
                # SE gates are per (clip, frame): gate each frame's valid
                # rows, then per-frame matmuls.
                for t in range(t_len):
                    v_t = v[t * hp : t * hp + h_len]
                    v_t = v_t * se_gate(v_t).reshape(1, 1, c)
                    e = jnp.dot(
                        v_t.astype(acc.dtype).reshape(h_len * wp, c), w3,
                        preferred_element_type=f32,
                    )
                    rows = pl.ds(base + t * h_len, h_len)
                    acc[rows] = acc[rows] + e.reshape(h_len, wp, c).astype(
                        acc.dtype
                    )
        return 0

    jax.lax.fori_loop(0, g_len, clip_body, 0)

    @pl.when(b == nb - 1)
    def _flush():
        out_ref[...] = acc[:, :w_len, :].astype(out_dtype)


def fused_block_run(x, vt, wm, se=None, *, max_shift, aq=False, group=None,
                    mxu_taps=None, se_batch=None, interpret=None):
    """Apply a chain of B fused blocks to a clip batch.

    Args:
      x: (N, T, H, W, C) activation (bf16 or f32).
      vt: (B, 4 + 3*(2K+2), C) f32 — folded bn1 scale/bias, bn2 scale/bias,
        then the T/H/W-axis shift tap weights (conv_backend._shift_kernel
        layout: tap j <-> offset j - K).
      wm: (B, 2, C, C) x.dtype — the two 1x1 conv kernels (in, out).
      se: optional (B, 2, C, Cr) f32 squeeze-excitation weights (fc1 and
        fc2 transposed, Cr = C // reduction zero-padded to its value) — when
        given, every block applies the SE gate between shift and conv3.
      max_shift: static K bound on the integer part of the shifts.
      group: clips per grid step (default: auto via pick_group).
      mxu_taps: run the T/H tap stages as chained diagonal-scaled matmuls
        on the MXU instead of VPU multiply-adds (2*(2K+2) extra matmuls per
        block; with SE the shifted activation is materialized and gated
        before per-frame conv3). Default on; RUBIKS_FUSED_MXU_TAPS=0
        disables for A/B.
      se_batch: batch the SE gate matmuls over all frames and run conv3 as
        ONE whole-clip matmul instead of t_len per-frame matmuls. Default ON
        (RUBIKS_FUSED_SE_BATCH=0 disables for A/B): the 5-round interleaved
        median is 1.172x vs per-frame SE (MODEL_AB.json round 4) and the
        on-chip exactness checks pass (PALLAS_TPU_OK.json
        fused_block_se_batch_*).

    Returns (N, T, H, W, C), equal to applying the B blocks sequentially.
    """
    n, t_len, h_len, w_len, c = x.shape
    nb = vt.shape[0]
    g_pre = group if group is not None else pick_group(x.shape, max_shift,
                                                       x.dtype, aq=aq)
    sdtype = pick_scratch_dtype(x.shape, max_shift, x.dtype, max(g_pre, 1),
                                aq=aq)
    k, sub, wp, tp, hp, wph = _geometry(t_len, h_len, w_len, c, max_shift,
                                        x.dtype, sdtype)
    # Tap count comes from the stacked params (stack_block_params trims the
    # identically-zero offset-(K+1) tap, so usually 2K+1, not 2K+2).
    taps_n = (vt.shape[1] - 4 - (3 if aq else 0)) // 3
    vt_rows = 4 + 3 * taps_n + (3 if aq else 0)
    assert vt.shape == (nb, vt_rows, c) and 1 <= taps_n <= 2 * k + 2, (
        vt.shape, vt_rows, taps_n)
    assert wm.shape == (nb, 2, c, c), wm.shape
    g_len = g_pre
    assert g_len >= 1 and n % g_len == 0, (n, g_len)
    th = t_len * h_len

    if mxu_taps is None:
        env = os.environ.get("RUBIKS_FUSED_MXU_TAPS", "0")
        if env in ("0", "1"):
            mxu_taps = env == "1"
        else:  # "auto": the per-shape heuristic, kept for A/B only
            # Default is VPU taps everywhere: the clean 5-round interleaved
            # e2e medians (MODEL_AB_R5.json, round 5) measured force-VPU at
            # 1.181x vs the per-shape schedule and force-MXU at 0.785x. The
            # round-3 per-stage captures that motivated this heuristic
            # (mxu "15x" at bf16-scratch stage2) predate the fixed timing
            # estimator (utils/benchmark.py) and were fetch-noise artifacts.
            mxu_taps = sdtype != jnp.float32
    if se_batch is None:
        se_batch = os.environ.get("RUBIKS_FUSED_SE_BATCH", "1") == "1"
    x3 = x.reshape(n * th, w_len, c)
    kernel = functools.partial(
        _kernel if se is not None else _kernel_no_se,
        g_len=g_len, t_len=t_len, h_len=h_len, w_len=w_len, c=c, k=k,
        taps_n=taps_n, wp=wp, tp=tp, hp=hp, wph=wph, out_dtype=x.dtype,
        aq=aq, mxu_taps=mxu_taps, se_batch=se_batch,
    )
    if mxu_taps:
        # conv2 + (T diag stage) + (H diag/fold stage) + SE's per-frame
        # conv3 (which sums to ~one slab matmul of FLOPs).
        n_matmuls = (1 + (0 if aq else taps_n) + taps_n
                     + (0 if se is None else 1))
    else:
        n_matmuls = 2
    n_vpu_tap_stages = 1 if mxu_taps else 3
    flops_per_step = g_len * (
        n_matmuls * 2 * th * wp * c * c
        + n_vpu_tap_stages * taps_n * 2 * th * wph * c
    )
    in_specs = [
        pl.BlockSpec((g_len * th, w_len, c), lambda i, b: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vt_rows, c), lambda i, b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, c, c), lambda i, b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x3, vt, wm]
    if se is not None:
        assert se.ndim == 4 and se.shape[:3] == (nb, 2, c), se.shape
        in_specs.append(
            pl.BlockSpec((1, 2, c, se.shape[3]), lambda i, b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(se)
    out = pl.pallas_call(
        kernel,
        grid=(n // g_len, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g_len * th, w_len, c), lambda i, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * th, w_len, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g_len * th, wp, c), x.dtype),       # accumulator
            pltpu.VMEM((g_len * tp * hp, wph, c), sdtype),   # halo buffer
            pltpu.VMEM((g_len * tp * hp, wp, c), sdtype),    # W-shifted
            # AQ: activated frames with one zero boundary frame per side
            pltpu.VMEM(
                (g_len * (t_len + 2) * h_len, wp, c) if aq else (8, 8, 128),
                x.dtype,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_group_vmem_bytes(
                        x.shape, max_shift, x.dtype, g_len,
                        _scratch_f32=sdtype == jnp.float32, aq=aq) * 1.3),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(n // g_len) * nb * flops_per_step,
            bytes_accessed=2 * x3.size * x3.dtype.itemsize
            + n * nb * 2 * c * c * jnp.dtype(x.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(*inputs)
    return out.reshape(n, t_len, h_len, w_len, c)


def pick_htile(shape, nb, max_shift, dtype, aq=False):
    """Choose an H tile size for fused_block_run_htiled, or None.

    Returns the largest divisor of H whose overlapped tiles fit VMEM with at
    most ~60% halo recompute overhead."""
    n, t, h, w, c = shape
    halo = nb * (max_shift + 1)
    for tile_h in sorted((d for d in range(1, h) if h % d == 0),
                         reverse=True):
        if tile_h + 2 * halo > h:
            continue  # window must fit inside the clip (clamped windows)
        if (tile_h + 2 * halo) / tile_h > 1.6:
            return None  # halo recompute overhead too high
        tiled = (n * (h // tile_h), t, tile_h + 2 * halo, w, c)
        if pick_group(tiled, max_shift, dtype, aq=aq) >= 1:
            return tile_h
    return None


def fused_block_run_htiled(x, vt, wm, se=None, *, max_shift, tile_h,
                           aq=False, group=None, mxu_taps=None,
                           interpret=None):
    """fused_block_run over H-tiles with overlapped halos, for stages whose
    whole clip does not fit VMEM (e.g. 112x112 early stages).

    Overlapping windows are materialized in XLA (one cheap gather pass) and
    run through the unchanged kernel as independent "clips". Window rows
    within nb*(K+1) of a window edge go stale (zero-fill instead of true
    neighbors, compounding (K+1) rows per chained block), so each tile keeps
    only its interior. Windows are CLAMPED to the clip rather than padded:
    at the true clip edges the kernel's own halo provides the exact
    zero-fill (a zero-padded input row would instead produce
    relu(bn2(conv2(relu(bn1(0))))) != 0 in shift space)."""
    n, t_len, h_len, w_len, c = x.shape
    nb = vt.shape[0]
    halo = nb * (max_shift + 1)
    # SE's gate is a global spatial mean — it cannot be computed on a tile.
    assert se is None, "SE blocks cannot be H-tiled"
    assert h_len % tile_h == 0, (h_len, tile_h)
    n_tiles = h_len // tile_h
    win = tile_h + 2 * halo
    assert win <= h_len, (tile_h, halo, h_len)
    starts = [
        min(max(j * tile_h - halo, 0), h_len - win) for j in range(n_tiles)
    ]
    tiles = jnp.stack(
        [jax.lax.slice_in_dim(x, s, s + win, axis=2) for s in starts],
        axis=1,
    )  # (N, n_tiles, T, win, W, C)
    xt = tiles.reshape(n * n_tiles, t_len, win, w_len, c)
    out = fused_block_run(xt, vt, wm, se, max_shift=max_shift, aq=aq,
                          group=group, mxu_taps=mxu_taps, interpret=interpret)
    out = out.reshape(n, n_tiles, t_len, win, w_len, c)
    parts = [
        jax.lax.slice_in_dim(
            out[:, j], j * tile_h - starts[j],
            j * tile_h - starts[j] + tile_h, axis=2,
        )
        for j in range(n_tiles)
    ]
    return jnp.concatenate(parts, axis=2)


def fold_bn(gamma, beta, mean, var, eps=_BN_EPS):
    """Inference-time batch-norm folding: y = scale * x + bias."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def stack_block_params(block_params, block_stats, dtype, max_shift,
                       quantize=False):
    """Stack a run of RubiksShiftBlock param/stat subtrees into the fused
    kernel's (vt, wm) arrays.

    block_params/block_stats: lists of the per-block 'params' /'batch_stats'
    subtrees as produced by nn/backbone.py (keys bn1, conv2, bn2,
    as3/rubiks3d/shift, conv3).
    """
    vts, wms = [], []
    for p, s in zip(block_params, block_stats):
        s1, b1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                         s["bn1"]["mean"], s["bn1"]["var"])
        s2, b2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                         s["bn2"]["mean"], s["bn2"]["var"])
        # Tap weights are built in the compute dtype (matching the conv
        # backend's shift.astype(x.dtype) semantics), then carried in f32.
        # Fractional mode: the last tap (offset +K+1) is identically zero
        # whenever |s| <= K (its weight is frac(s - K), only nonzero for
        # s > K, which already violates the max_shift bound for every
        # backend) — trim it statically: 2K+1 taps instead of 2K+2, one
        # fewer tap matmul per axis stage in the fused kernels.
        # Quantize mode MUST keep all 2K+2 taps: rounding places a one-hot
        # at floor(s)+1 whenever frac(s) >= 0.5 (conv_backend._shift_kernel;
        # cuda_src/rubiks3d_kernels.cu:76-93 gathers at the *rounded* cell),
        # so any shift in (K+0.5, K+1] lands exactly on the offset-(K+1)
        # tap — trimming it silently zeroes that channel.
        tn = 2 * max_shift + 2 if quantize else 2 * max_shift + 1
        shift = p["as3"]["rubiks3d"]["shift"].astype(dtype)
        taps = jnp.concatenate([
            _shift_kernel(shift[0], dtype, max_shift, quantize)[:tn],
            _shift_kernel(shift[1], dtype, max_shift, quantize)[:tn],
            _shift_kernel(shift[2], dtype, max_shift, quantize)[:tn],
        ]).astype(jnp.float32)
        vts.append(jnp.concatenate(
            [jnp.stack([s1, b1, s2, b2]).astype(jnp.float32), taps]
        ))
        c = shift.shape[-1]
        wms.append(jnp.stack([
            p["conv2"]["kernel"].reshape(c, c).astype(dtype),
            p["conv3"]["kernel"].reshape(c, c).astype(dtype),
        ]))
    return jnp.stack(vts), jnp.stack(wms)


def stack_block_params_aq(block_params, block_stats, dtype, max_shift,
                          temperature=2.0):
    """Stack AQ-variant blocks: 2D spatial shift (as3.shift, (2, C)) with an
    identity temporal tap row, plus 3 rows of normalized attention-shift
    weights appended (rubiksnet/attention_shift.py semantics)."""
    from ..attention_shift import attention_shift_weights

    vts, wms = [], []
    for p, s in zip(block_params, block_stats):
        s1, b1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                         s["bn1"]["mean"], s["bn1"]["var"])
        s2, b2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                         s["bn2"]["mean"], s["bn2"]["var"])
        shift2d = p["as3"]["shift"].astype(dtype)  # (2, C): (sH, sW)
        c = shift2d.shape[-1]
        zero = jnp.zeros((c,), dtype)
        tn = 2 * max_shift + 1  # trailing tap zero for |s| <= K (see above)
        taps = jnp.concatenate([
            _shift_kernel(zero, dtype, max_shift, False)[:tn],  # identity T
            _shift_kernel(shift2d[0], dtype, max_shift, False)[:tn],
            _shift_kernel(shift2d[1], dtype, max_shift, False)[:tn],
        ]).astype(jnp.float32)
        aw = attention_shift_weights(
            p["aq_shift"]["weight"].astype(dtype), temperature
        ).astype(jnp.float32)  # (C, 3)
        vts.append(jnp.concatenate([
            jnp.stack([s1, b1, s2, b2]).astype(jnp.float32), taps, aw.T,
        ]))
        wms.append(jnp.stack([
            p["conv2"]["kernel"].reshape(c, c).astype(dtype),
            p["conv3"]["kernel"].reshape(c, c).astype(dtype),
        ]))
    return jnp.stack(vts), jnp.stack(wms)


def stack_se_params(block_params):
    """Stack per-block SELayer weights into the kernel's (B, 2, C, Cr)
    array: slot 0 = fc1 (C, Cr), slot 1 = fc2 transposed (C, Cr)."""
    ses = []
    for p in block_params:
        fc1 = p["se"]["fc1"]["kernel"].astype(jnp.float32)  # (C, Cr)
        fc2 = p["se"]["fc2"]["kernel"].astype(jnp.float32)  # (Cr, C)
        ses.append(jnp.stack([fc1, fc2.T]))
    return jnp.stack(ses)

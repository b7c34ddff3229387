"""Per-frame fused multi-block Pallas kernel for large-spatial stages.

The whole-clip kernel (fused_block.py) needs the entire clip plus its halo
buffers resident in VMEM, which the backbone's 112^2/56^2 early stages
(geometry of /root/reference/rubiksnet/backbone.py:109-135 after the
stride-2 stem) cannot satisfy on v5e. This variant keeps the same chain
semantics

    x_{b+1} = x_b + conv3(se(shift3d(relu(bn2(conv2(relu(bn1(x_b))))))))

but schedules ONE FRAME PER GRID STEP: grid = (clips, blocks, 3*T), three
phases per block:

  phase A (T steps): bn1+relu on the frame, 1x1-conv MXU matmul, bn2+relu,
    stored into the halo buffer with freshly zeroed halo borders;
  phase B (T steps): the W-axis shift taps, IN PLACE in the halo buffer
    (value-load the frame, tap, store back) — this replaces the whole-clip
    kernel's separate W-shifted scratch, whose extra ~36 MB is what pushed
    112^2 clips out of VMEM;
  phase C (T steps): T/H taps (factored diagonal matmuls on the MXU, or VPU
    multiply-adds), the SE gate, the conv3 matmul, and the shortcut add.

Frames advance as *grid iterations*, not unrolled Python loops, so the
compiled body stays one frame's worth of code — the unrolled per-frame
schedule this replaces sent this runtime's Mosaic into an apparently
unbounded compile (see fused_block.py::_PER_FRAME_ROWS).

Why SE works here but not with H-tiling: the SE gate is a *global spatial
mean* over the frame (backbone.py SELayer), so any schedule that splits a
frame across independent grid steps cannot compute it; a per-frame step
sees the whole frame.

Input/output BlockSpecs are per frame so the pipeline buffers hold one
frame each (whole-clip blocks would cost 4 x ~26 MB at 112^2).

AQ is not supported (its temporal attention mix happens in activation
space before conv2 and would need a fourth phase with its own buffer); the
executor keeps AQ early stages on the unfused path.

Replaces, together with fused_block.py, the production fast path role of
/root/reference/cuda_src/rubiks3d_kernels.cu:15-205.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import _geometry, _round_up, _VMEM_LIMIT_CAP

# Leave headroom under the empirically verified ~120 MB per-kernel VMEM
# ceiling for Mosaic's own temporaries (which this estimate models
# coarsely).
_FRAMES_VMEM_BUDGET = 114 * 1024 * 1024


def _frames_vmem_bytes(shape, max_shift, dtype, sdtype) -> int:
    n, t, h, w, c = shape
    k, sub, wp, tp, hp, wph = _geometry(t, h, w, c, max_shift, dtype, sdtype)
    itemsize = jnp.dtype(dtype).itemsize
    sitem = jnp.dtype(sdtype).itemsize
    cp = _round_up(c, 128)
    acc = t * h * wp * cp * itemsize
    cbuf = tp * hp * wph * cp * sitem
    io = 4 * h * wp * cp * itemsize  # double-buffered per-frame in + out
    weights = 4 * cp * cp * itemsize
    # Live per-frame f32 temporaries: phase C holds ~2 halo-frame values
    # (tap source + accumulator) and ~2 frame values (v, conv3 result);
    # phases A/B stay under that.
    temps = 2 * hp * wph * cp * 4 + 2 * hp * wp * cp * 4 + 2 * h * wp * cp * 4
    return acc + cbuf + io + weights + temps


def pick_frames_sdtype(shape, max_shift, dtype):
    """Scratch dtype for the halo buffer: f32 when it fits (exact tap math,
    no conversions), else the compute dtype."""
    if jnp.dtype(dtype).itemsize >= 4:
        return dtype if _frames_vmem_bytes(
            shape, max_shift, dtype, dtype) <= _FRAMES_VMEM_BUDGET else None
    if _frames_vmem_bytes(shape, max_shift, dtype,
                          jnp.float32) <= _FRAMES_VMEM_BUDGET:
        return jnp.float32
    if _frames_vmem_bytes(shape, max_shift, dtype,
                          dtype) <= _FRAMES_VMEM_BUDGET:
        return dtype
    return None


def fused_frames_supported(shape, max_shift, dtype, aq=False) -> bool:
    if aq or jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return pick_frames_sdtype(shape, max_shift, dtype) is not None


def _kernel(
    x_ref, vt_ref, wm_ref, se_ref, out_ref, acc, cbuf,
    *, nb, t_len, h_len, w_len, c, k, wp, tp, hp, wph, out_dtype,
    mxu_taps=True,
):
    b = pl.program_id(1)
    s = pl.program_id(2)
    taps_n = 2 * k + 2
    f32 = jnp.float32
    first = jnp.logical_and(pl.program_id(0) == 0,
                            jnp.logical_and(b == 0, s == 0))

    @pl.when(first)
    def _zero():
        # Halo frames of cbuf must read as exact zeros (the shift's
        # out-of-bounds fill). Phase B's in-place W-taps keep zero frames
        # zero, and phase A re-zeroes each interior frame's borders, so one
        # zeroing suffices for the whole run. acc is zeroed only against
        # NaN garbage in the padded-W columns (values there are confined
        # but NaN * 0 is not).
        cbuf[...] = jnp.zeros_like(cbuf)
        acc[...] = jnp.zeros_like(acc)

    bn1_s = vt_ref[0, 0, :].astype(acc.dtype).reshape(1, 1, c)
    bn1_b = vt_ref[0, 1, :].astype(acc.dtype).reshape(1, 1, c)
    bn2_s = vt_ref[0, 2, :].reshape(1, c)
    bn2_b = vt_ref[0, 3, :].reshape(1, c)
    w2 = wm_ref[0, 0]
    w3 = wm_ref[0, 1]

    def se_gate(v_frame):
        """Squeeze-excitation gate (1, c) for one frame's shifted
        activation (backbone.py SELayer: spatial mean, fc-relu-fc,
        sigmoid)."""
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

    @pl.when(s < t_len)
    def _phase_a():
        rows = pl.ds(s * h_len, h_len)

        @pl.when(b == 0)
        def _load():
            if wp > w_len:
                acc[rows, w_len:wp, :] = jnp.zeros(
                    (h_len, wp - w_len, c), acc.dtype
                )
            acc[rows, 0:w_len, :] = x_ref[...].astype(acc.dtype)

        a = jnp.maximum(acc[rows] * bn1_s + bn1_b, 0)
        bm = jnp.dot(a.reshape(h_len * wp, c), w2,
                     preferred_element_type=f32)
        cm = jnp.maximum(bm * bn2_s + bn2_b, 0).astype(cbuf.dtype)
        fbase = (k + s) * hp
        # Fresh zero borders every block: the previous block's in-place
        # W-taps (phase B) left non-zero values outside the interior.
        cbuf[pl.ds(fbase, hp)] = jnp.zeros((hp, wph, c), cbuf.dtype)
        cbuf[pl.ds(fbase + k, h_len), k : k + w_len, :] = cm.reshape(
            h_len, wp, c
        )[:, :w_len, :]

    @pl.when(jnp.logical_and(s >= t_len, s < 2 * t_len))
    def _phase_b():
        fbase = (s - t_len + k) * hp
        cc = cbuf[pl.ds(fbase, hp)].astype(f32)  # full frame, then slice
        wv = None
        for j in range(taps_n):
            term = vt_ref[0, 4 + 2 * taps_n + j, :].reshape(1, 1, c) * (
                cc[:, j : j + wp, :]
            )
            wv = term if wv is None else wv + term
        cbuf[pl.ds(fbase, hp), 0:wp, :] = wv.astype(cbuf.dtype)

    @pl.when(s >= 2 * t_len)
    def _phase_c():
        t = s - 2 * t_len
        if mxu_taps:
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
            ).astype(f32)
            u_acc = None
            for l in range(taps_n):
                d = (eye * vt_ref[0, 4 + l, :].reshape(1, c)).astype(
                    acc.dtype
                )
                u_l = cbuf[pl.ds((t + l) * hp, hp), 0:wp, :].astype(
                    acc.dtype
                )
                term = jnp.dot(u_l.reshape(hp * wp, c), d,
                               preferred_element_type=f32)
                u_acc = term if u_acc is None else u_acc + term
            u1 = u_acc.reshape(hp, wp, c).astype(acc.dtype)
            v_acc = None
            for j in range(taps_n):
                d = (eye * vt_ref[0, 4 + taps_n + j, :].reshape(1, c)
                     ).astype(acc.dtype)
                term = jnp.dot(
                    u1[j : j + h_len].reshape(h_len * wp, c), d,
                    preferred_element_type=f32,
                )
                v_acc = term if v_acc is None else v_acc + term
            v = v_acc.reshape(h_len, wp, c)
        else:
            u = None
            for l in range(taps_n):
                term = vt_ref[0, 4 + l, :].reshape(1, 1, c) * (
                    cbuf[pl.ds((t + l) * hp, hp), 0:wp, :].astype(f32)
                )
                u = term if u is None else u + term
            v = None
            for j in range(taps_n):
                term = vt_ref[0, 4 + taps_n + j, :].reshape(1, 1, c) * (
                    u[j : j + h_len]
                )
                v = term if v is None else v + term
        if se_ref is not None:
            v = v * se_gate(v).reshape(1, 1, c)
        e = jnp.dot(v.astype(acc.dtype).reshape(h_len * wp, c), w3,
                    preferred_element_type=f32)
        rows = pl.ds(t * h_len, h_len)
        new = acc[rows] + e.reshape(h_len, wp, c).astype(acc.dtype)
        acc[rows] = new

        @pl.when(b == nb - 1)
        def _out():
            out_ref[...] = new[:, :w_len, :].astype(out_dtype)


def _kernel_no_se(x_ref, vt_ref, wm_ref, out_ref, acc, cbuf, **kw):
    _kernel(x_ref, vt_ref, wm_ref, None, out_ref, acc, cbuf, **kw)


def fused_frames_run(x, vt, wm, se=None, *, max_shift, mxu_taps=None,
                     interpret=None):
    """Apply a chain of B fused blocks, one frame per grid step.

    Same contract as fused_block.fused_block_run (minus AQ/group): x is
    (N, T, H, W, C); vt/wm/se as produced by stack_block_params /
    stack_se_params. Returns (N, T, H, W, C).
    """
    n, t_len, h_len, w_len, c = x.shape
    nb = vt.shape[0]
    sdtype = pick_frames_sdtype(x.shape, max_shift, x.dtype)
    assert sdtype is not None, ("shape too large even per frame", x.shape)
    k, sub, wp, tp, hp, wph = _geometry(t_len, h_len, w_len, c, max_shift,
                                        x.dtype, sdtype)
    taps_n = 2 * k + 2
    assert vt.shape == (nb, 4 + 3 * taps_n, c), vt.shape
    assert wm.shape == (nb, 2, c, c), wm.shape
    if mxu_taps is None:
        mxu_taps = os.environ.get("RUBIKS_FUSED_MXU_TAPS", "1") == "1"

    x3 = x.reshape(n * t_len * h_len, w_len, c)
    kernel = functools.partial(
        _kernel if se is not None else _kernel_no_se,
        nb=nb, t_len=t_len, h_len=h_len, w_len=w_len, c=c, k=k,
        wp=wp, tp=tp, hp=hp, wph=wph, out_dtype=x.dtype, mxu_taps=mxu_taps,
    )
    in_specs = [
        pl.BlockSpec(
            (h_len, w_len, c),
            lambda i, b, s: (i * t_len + jnp.minimum(s, t_len - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, 4 + 3 * taps_n, c), lambda i, b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, c, c), lambda i, b, s: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x3, vt, wm]
    if se is not None:
        assert se.ndim == 4 and se.shape[:3] == (nb, 2, c), se.shape
        in_specs.append(
            pl.BlockSpec((1, 2, c, se.shape[3]),
                         lambda i, b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(se)

    def out_index(i, b, s):
        # Pin to frame 0 except in the last block's phase C, so the only
        # buffer flushes are of frames that were actually written.
        f = jnp.where(b == nb - 1,
                      jnp.clip(s - 2 * t_len, 0, t_len - 1), 0)
        return (i * t_len + f, 0, 0)

    n_matmuls = (1 + 2 * taps_n + 1) if mxu_taps else 2
    flops_per_step = (
        n_matmuls * 2 * h_len * wp * c * c
        + (1 if mxu_taps else 3) * taps_n * 2 * hp * wph * c
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, nb, 3 * t_len),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((h_len, w_len, c), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * t_len * h_len, w_len, c),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_len * h_len, wp, c), x.dtype),  # clip accumulator
            pltpu.VMEM((tp * hp, wph, c), sdtype),        # halo buffer
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_frames_vmem_bytes(x.shape, max_shift, x.dtype,
                                           sdtype) * 1.1),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * nb * t_len * flops_per_step,
            bytes_accessed=2 * x3.size * x3.dtype.itemsize
            + n * nb * 2 * c * c * jnp.dtype(x.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(*inputs)
    return out.reshape(n, t_len, h_len, w_len, c)

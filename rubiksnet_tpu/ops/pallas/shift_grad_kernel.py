"""One-pass Pallas kernel for the (3, C) shift-parameter gradient.

TPU equivalent of the reference's dedicated shift-gradient kernel
(cuda_src/rubiks3d_kernels.cu:218-452 + the addmv_ reduction at
cuda_src/rubiks.cpp:344-345). The XLA formulation (ops/shift3d.py
rubiks_shift_3d_shift_grad) materializes ~8 full-clip intermediate tensors in
HBM; it measured ~80% of the whole training backward. This kernel reads x and
the upstream gradient ONCE into VMEM and produces the (3, C) gradient with no
HBM intermediates.

Math (see ops/shift3d.py:208-276 for the derivation): with corrected per-axis
lerp taps L'_a and difference taps D_a,

    g_T = sum og * L'_W(L'_H(D_T(x)))
    g_H = sum og * L'_W(D_H(L'_T(x)))
    g_W = sum og * D_W(L'_H(L'_T(x)))

All per-axis taps are one-hot pairs inside a static window [-K-1, K+1]
(K = max_shift bound, the -K-1 reach comes from the integer-remainder
backward-difference correction), so with x in a zero-halo'd (t', h) row
layout (frames stacked with margins, exactly like ops/pallas/fused_block.py):

  * the W-axis taps are whole-slab sublane-shifted multiply-adds, computed
    once into two buffers (L_W(x) and D_W(x));
  * a (T=l, H=j) tap pair is a SINGLE row offset l*hp + j into those
    buffers, so each of the (2K+3)^2 pairs costs one whole-clip
    multiply + per-channel reduction against the (halo-layout) upstream
    gradient — no intermediate tensors at all;
  * the three gradients share the same 2 x (2K+3)^2 reduction table S:
    g_T = sum_{l,j} dT_l lH_j S_L(l,j), g_H = sum lT_l dH_j S_L(l,j),
    g_W = sum lT_l lH_j S_D(l,j).

Supported: stride 1, padding 0 (the shape of every shift in the production
models except the 4 stage-entry blocks), any float dtype (accumulation in
f32), |floor(shift)| <= max_shift (same contract as the conv backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 96 * 1024 * 1024
_VMEM_LIMIT_CAP = 120 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _geometry(t, h, w, max_shift):
    m = max_shift + 1
    wp = _round_up(w, 8)  # all scratch is f32: sublane tile 8
    tp = t + 2 * m
    hp = h + 2 * m
    wph = _round_up(wp + 2 * m, 8)
    return m, wp, tp, hp, wph


def corrected_tap_weights(shift, max_shift):
    """(6, 2K+3, C) f32 tap table: rows (lT, dT, lH, dH, lW, dW).

    Tap index j corresponds to offset j - (K+1). The corrected small tap
    moves back one cell at exact-integer shifts
    (cuda_src/rubiks3d_kernels.cu:288-298)."""
    shift = shift.astype(jnp.float32)
    small = jnp.floor(shift)
    r = shift - small
    is_int = (r == 0).astype(jnp.int32)
    sc = small.astype(jnp.int32) - is_int
    lg = small.astype(jnp.int32) + 1
    m = max_shift + 1
    offs = jnp.arange(2 * m + 1, dtype=jnp.int32)[:, None] - m
    rows = []
    for a in range(3):
        hit_s = (offs == sc[a][None, :]).astype(jnp.float32)
        hit_l = (offs == lg[a][None, :]).astype(jnp.float32)
        rows.append(hit_s * (1 - r[a])[None, :] + hit_l * r[a][None, :])
        rows.append(hit_l - hit_s)
    return jnp.stack(rows)


def _group_vmem_bytes(shape, max_shift, group: int) -> int:
    n, t, h, w, c = shape
    m, wp, tp, hp, wph = _geometry(t, h, w, max_shift)
    cp = _round_up(c, 128)
    g = group
    xb = g * tp * hp * wph * cp * 4
    wlwd = 2 * g * (tp * hp + 2 * m) * wp * cp * 4
    ogb = g * t * hp * wp * cp * 4
    io = 2 * 2 * 2 * g * t * h * wp * cp * 4  # double-buffered x + og blocks
    temps = 3 * tp * hp * wph * cp * 4  # whole-clip W-stage / pair products
    return xb + wlwd + ogb + io + temps


def pick_group(shape, max_shift) -> int:
    n = shape[0]
    g = 8 if n % 8 == 0 else (4 if n % 4 == 0 else (2 if n % 2 == 0 else 1))
    while g >= 1:
        if n % g == 0 and _group_vmem_bytes(shape, max_shift, g) <= _VMEM_BUDGET:
            return g
        g //= 2
    return 0


def shift_grad_pallas_supported(x_shape, og_shape, stride, padding, dtype,
                                max_shift) -> bool:
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (0, 0, 0):
        return False
    if tuple(x_shape) != tuple(og_shape):
        return False
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return pick_group(x_shape, max_shift) >= 1


def _kernel(x_ref, og_ref, tw_ref, out_ref, xb, wl, wd, ogb, *,
            g_len, t_len, h_len, w_len, c, m, wp, tp, hp, wph):
    i = pl.program_id(0)
    taps2 = 2 * m + 1
    th = t_len * h_len
    f32 = jnp.float32
    fhp = tp * hp  # xb rows per clip
    wrows = fhp + 2 * m  # wl/wd rows per clip (extra +-m row margin)
    orows = t_len * hp  # ogb rows per clip (frame t at [t*hp+m, t*hp+m+h))

    @pl.when(i == 0)
    def _init():
        # Halo regions must read as true zeros; interiors are fully
        # overwritten every grid step.
        xb[...] = jnp.zeros_like(xb)
        wl[...] = jnp.zeros_like(wl)
        wd[...] = jnp.zeros_like(wd)
        ogb[...] = jnp.zeros_like(ogb)
        out_ref[...] = jnp.zeros_like(out_ref)

    def clip_body(g, acc):
        xbase = g * fhp
        wbase = g * wrows
        obase = g * orows
        # Scatter x into the zero-halo'd (t', h) row layout; og into the
        # compact halo layout whose row r maps to wl row l*hp + j + r for
        # tap pair (l, j).
        for t in range(t_len):
            src = pl.ds(g * th + t * h_len, h_len)
            xb[pl.ds(xbase + (m + t) * hp + m, h_len), m : m + w_len, :] = (
                x_ref[src].astype(f32)
            )
            ogb[pl.ds(obase + t * hp + m, h_len), :w_len, :] = (
                og_ref[src].astype(f32)
            )

        # W-axis tap stage, whole clip: wl = L'_W(x), wd = D_W(x).
        xs = xb[pl.ds(xbase, fhp)]
        al = ad = None
        for j in range(taps2):
            sl = xs[:, j : j + wp, :]
            tl = tw_ref[0, 4, j, :].reshape(1, 1, c) * sl
            td = tw_ref[0, 5, j, :].reshape(1, 1, c) * sl
            al = tl if al is None else al + tl
            ad = td if ad is None else ad + td
        wl[pl.ds(wbase + m, fhp)] = al
        wd[pl.ds(wbase + m, fhp)] = ad

        # (T, H) tap pairs: one slab multiply + per-channel reduction each.
        og_c = ogb[pl.ds(obase, orows)]
        gt = jnp.zeros((c,), f32)
        gh = jnp.zeros((c,), f32)
        gw = jnp.zeros((c,), f32)
        for l in range(taps2):
            for j in range(taps2):
                rows = pl.ds(wbase + l * hp + j, orows)
                s_l = jnp.sum(og_c * wl[rows], axis=(0, 1))
                s_d = jnp.sum(og_c * wd[rows], axis=(0, 1))
                gt = gt + tw_ref[0, 1, l, :] * tw_ref[0, 2, j, :] * s_l
                gh = gh + tw_ref[0, 0, l, :] * tw_ref[0, 3, j, :] * s_l
                gw = gw + tw_ref[0, 0, l, :] * tw_ref[0, 2, j, :] * s_d
        return acc + jnp.stack([gt, gh, gw])

    total = jax.lax.fori_loop(
        0, g_len, clip_body, jnp.zeros((3, c), f32)
    )
    out_ref[...] = out_ref[...] + total


def rubiks_shift3d_shift_grad_pallas(og, x, shift, max_shift, group=None,
                                     interpret=None):
    """(3, C) un-normalized shift gradient; see module docstring.

    og, x: (N, T, H, W, C) with identical shapes (stride-1/pad-0 only).
    shift: (3, C). Returns f32.
    """
    n, t_len, h_len, w_len, c = x.shape
    assert og.shape == x.shape, (og.shape, x.shape)
    m, wp, tp, hp, wph = _geometry(t_len, h_len, w_len, max_shift)
    g_len = group if group is not None else pick_group(x.shape, max_shift)
    assert g_len >= 1 and n % g_len == 0, (n, g_len)
    th = t_len * h_len
    taps2 = 2 * m + 1

    # Taps are derived from the compute-dtype shift (matching the XLA path's
    # shift.astype(x.dtype) semantics), carried in f32.
    tw = corrected_tap_weights(shift.astype(x.dtype), max_shift)
    x3 = x.reshape(n * th, w_len, c)
    og3 = og.reshape(n * th, w_len, c)
    kernel = functools.partial(
        _kernel, g_len=g_len, t_len=t_len, h_len=h_len, w_len=w_len, c=c,
        m=m, wp=wp, tp=tp, hp=hp, wph=wph,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // g_len,),
        in_specs=[
            pl.BlockSpec((g_len * th, w_len, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_len * th, w_len, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, taps2, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g_len * tp * hp, wph, c), jnp.float32),        # xb
            pltpu.VMEM((g_len * (tp * hp + 2 * m), wp, c), jnp.float32),
            pltpu.VMEM((g_len * (tp * hp + 2 * m), wp, c), jnp.float32),
            pltpu.VMEM((g_len * t_len * hp, wp, c), jnp.float32),      # ogb
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_group_vmem_bytes(x.shape, max_shift, g_len) * 1.3),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (taps2 * 2 + taps2 ** 2 * 2 * 2) * n * th * wp * c,
            bytes_accessed=2 * (x3.size * x3.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(x3, og3, tw.reshape(1, 6, taps2, c))
    return out

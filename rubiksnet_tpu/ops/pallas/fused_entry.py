"""Fused Pallas kernel for a strided stage-entry RubiksShift block.

The four stage-entry blocks (layer1_0..layer4_0 of
/root/reference/rubiksnet/backbone.py:156-200) carry the backbone's
downsampling: stride-2 shift + channel growth + a strided 1x1-conv shortcut
on the activated input (backbone.py:104-127). They cannot join the stride-1
chain kernels (fused_block.py / fused_frames.py), so they ran as the ~8-HBM-
pass unfused XLA graph — at the *largest* activations (the layer1_0 entry
reads the full 112^2 stage-0 tensor).

This kernel executes one whole entry block

    out = conv3(se(shift3d_s2(relu(bn2(conv2(relu(bn1(x))))))))
          + conv_s2(relu(bn1(x)))

in a single pass: x is read once, out is written once at 1/4 resolution.

Key identity: with padding 0, the reference's strided output grid
(rubiksnet/shiftlib/rubiks3d/primitive.py:24-47 — out[h'] samples position
s*h' + shift) makes a strided shift EXACTLY a stride-1 shift followed by 2x
decimation: v_s2[h', w'] = v_s1[2h', 2w'].

Mosaic on this runtime rejects ALL strided vector slices at verification
("expected strides to be confined to [1, 2)" — scripts/mosaic_probe.py), so
the two decimations use strided-slice-free constructions, both probed OK
on-chip:

  * W (the sublane dim): the kernel works in a DE-INTERLEAVED column layout
    [E | O] with E_q = col 2q, O_q = col 2q+1, built by XLA outside the
    kernel (strided slices are fine in XLA). A stride-1 column shift by d
    maps to unit-stride slices of the halves (source half = (d mod 2),
    half-offset = (d - d mod 2)/2), and the W decimation is just "take the
    E half". Since only the E half survives decimation, the W taps compute
    ONLY the E output — half the tap work of the natural layout.
  * H (the untiled major dim of the rank-3 frame): a value reshape
    (rows, w, c) -> (rows/2, 2, w, c) splitting the major dim (layout
    preserving) + a unit-stride parity slice. The H taps then read
    uP[j mod 2][r + j//2] for source row 2r + j — unit strides only.

Grid = (clip groups, 2T): phase AB (frame t: bn1/conv2/bn2 into the halo
buffer + in-place E-half W taps + shortcut matmul on even rows / E cols),
then phase C (frame t: T taps, parity-split H taps with decimation, SE gate
on the decimated activation, conv3 matmul, shortcut add, output write). All
tap/slice arithmetic is f32 (Mosaic here miscompiles odd-offset bf16 value
slices; see fused_block.py).

AQ entry blocks are not handled (their temporal attention mix precedes
conv2); the executor keeps those unfused.

Replaces, for the strided blocks, the production fast-path role of
/root/reference/cuda_src/rubiks3d_kernels.cu:15-205 (strided forward path:
the `% stride` gathers at :586+).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import _round_up, _sub, _VMEM_LIMIT_CAP, fold_bn

_ENTRY_VMEM_BUDGET = 110 * 1024 * 1024


def _entry_geometry(shape, mid, max_shift, dtype, sdtype):
    """Padded geometry of the de-interleaved schedule.

    Returns (k, ho, wo, wop, whi, wce, sh, hbE, hbO, wph, tp, hp):
    decimated dims, f32 staging width, input half width, phase-C read
    extent, half stride, the two half base columns, halo buffer width, and
    padded frame/row counts.
    """
    n, t, h, w, cin = shape
    k = max_shift
    ho, wo = h // 2, w // 2
    whi = _round_up(wo, _sub(dtype))   # input half width (dw layout)
    wop = _round_up(wo, 8)             # f32 staging / output compute width
    sub_s = _sub(sdtype)
    kb = sub_s                         # aligned halo columns per half
    assert (k + 1) // 2 <= kb, (k, kb)
    wce = _round_up(wop + k // 2 + 2, sub_s)
    sh = _round_up(kb + wce, sub_s)
    hbE, hbO = kb, sh + kb
    wph = 2 * sh
    tp = t + 2 * k + 1
    hp = h + 2 * k + 1
    return k, ho, wo, wop, whi, wce, sh, hbE, hbO, wph, tp, hp


def _entry_vmem_bytes(shape, mid, max_shift, dtype, sdtype, se, hs=1,
                      g=1) -> int:
    n, t, h, w, cin = shape
    k, ho, wo, wop, whi, wce, sh, hbE, hbO, wph, tp, hp = _entry_geometry(
        shape, mid, max_shift, dtype, sdtype)
    item = jnp.dtype(dtype).itemsize
    sitem = jnp.dtype(sdtype).itemsize
    cpi = _round_up(cin, 128)
    cp = _round_up(mid, 128)
    cbuf = g * tp * hp * wph * cp * sitem
    scbuf = g * t * ho * wop * cp * 4
    io = 4 * g * h * 2 * whi * cpi * item + 4 * g * ho * wo * cp * item
    vdbuf = ho * wop * cp * 4 if se else 0
    weights = (2 * cpi * cp + cp * cp) * item
    # Phase temporaries (f32), conservatively budgeted together
    # (pl.when branches can coexist across Mosaic's scheduling windows).
    hpc = -(-hp // hs)
    hoc = -(-ho // hs)
    un2 = 2 * hoc + 2 * k
    temps = 4 * (
        h * 2 * whi * cpi          # a
        + 2 * h * 2 * whi * cp     # bm / cm
        + 2 * ho * wop * max(cpi, cp)  # ad / sc
        + hpc * wph * cp + hpc * wop * cp  # cc / wv (W-tap chunk)
        + 2 * un2 * wce * cp       # u / u4
        + 2 * hoc * wop * cp       # v / e
    )
    return cbuf + scbuf + io + vdbuf + weights + temps


_HS_CANDIDATES = (1, 2, 4, 8)


def pick_entry_plan(shape, mid, max_shift, dtype, se):
    """(scratch dtype, row-chunk count) or None. f32 scratch preferred
    (native tap math); more chunks only when needed to fit VMEM."""
    if jnp.dtype(dtype).itemsize >= 4:
        sdtypes = [dtype]
    else:
        sdtypes = [jnp.float32, dtype]
    for sd in sdtypes:
        for hs in _HS_CANDIDATES:
            if _entry_vmem_bytes(shape, mid, max_shift, dtype, sd, se,
                                 hs=hs) <= _ENTRY_VMEM_BUDGET:
                return sd, hs
    return None


def pick_entry_group(shape, mid, max_shift, dtype, sdtype, se, hs) -> int:
    n = shape[0]
    gmax = int(os.environ.get("RUBIKS_FUSED_GROUP", "8"))
    g = 1 << (max(min(gmax, n), 1).bit_length() - 1)
    while g > 1:
        if n % g == 0 and _entry_vmem_bytes(
                shape, mid, max_shift, dtype, sdtype, se, hs=hs,
                g=g) <= _ENTRY_VMEM_BUDGET:
            return g
        g //= 2
    return 1


def fused_entry_supported(shape, cin, mid, max_shift, dtype,
                          se=False) -> bool:
    n, t, h, w, c = shape
    if c != cin or h % 2 or w % 2:
        return False
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return pick_entry_plan(shape, mid, max_shift, dtype, se) is not None


def _kernel(
    x_ref, vt1_ref, vt2_ref, w2_ref, w3_ref, wsc_ref, se_ref, out_ref,
    cbuf, scbuf, vdbuf,
    *, g_len, t_len, h_len, w_len, cin, mid, k, taps_n, hs, ho, wo, wop,
    whi, wce, sh, hbE, hbO, wph, tp, hp, out_dtype,
):
    s = pl.program_id(1)
    f32 = jnp.float32
    fhp = tp * hp
    tho = t_len * ho
    first = jnp.logical_and(pl.program_id(0) == 0, s == 0)
    mdt = x_ref.dtype  # matmul operand dtype
    # f32 operands at DEFAULT precision go through the MXU as bf16 passes;
    # force exact f32 so the compiled kernel matches interpret mode (the
    # on-chip artifact's vs-interpret leg). bf16 operands are native.
    prec = jax.lax.Precision.HIGHEST if mdt == f32 else None

    @pl.when(first)
    def _zero():
        # Halo frames must read as exact zeros (the shift's OOB fill); they
        # are never written afterwards. Interior frames are re-zeroed in
        # phase AB before each write. scbuf is fully overwritten per clip.
        cbuf[...] = jnp.zeros_like(cbuf)

    def each_clip(body):
        jax.lax.fori_loop(0, g_len, lambda gi, _: (body(gi), 0)[1], 0)

    bn1_s = vt1_ref[0, :].astype(f32).reshape(1, 1, cin)
    bn1_b = vt1_ref[1, :].astype(f32).reshape(1, 1, cin)
    bn2_s = vt2_ref[0, :].reshape(1, mid)
    bn2_b = vt2_ref[1, :].reshape(1, mid)

    def gate_from_mean(m):
        y1 = jnp.maximum(
            jnp.dot(m, se_ref[0], preferred_element_type=f32,
                    precision=prec), 0
        )
        y2 = jax.lax.dot_general(
            y1, se_ref[1],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=prec,
        )
        return jax.nn.sigmoid(y2)

    @pl.when(s < t_len)
    def _phase_ab():
        def ab_clip(gi):
            a = jnp.maximum(
                x_ref[gi].astype(f32) * bn1_s + bn1_b, 0
            )  # (h, 2*whi, cin), de-interleaved cols

            # Strided shortcut: stride-2 conv samples even rows (major-dim
            # reshape-split) and even cols (= the E half), one matmul,
            # staged for phase C.
            ad = a.reshape(h_len // 2, 2, 2 * whi, cin)[:, 0][:, 0:wop, :]
            sc = jnp.dot(ad.astype(mdt).reshape(ho * wop, cin),
                         wsc_ref[...], preferred_element_type=f32,
                         precision=prec)
            scbuf[pl.ds(gi * tho + s * ho, ho)] = sc.reshape(ho, wop, mid)

            # Main path into the halo buffer (fresh zero borders), halves
            # written separately (whi is sublane-tile aligned, so both
            # value-slice offsets are legal for bf16).
            fbase = gi * fhp + (k + s) * hp
            cbuf[pl.ds(fbase, hp)] = jnp.zeros((hp, wph, mid), cbuf.dtype)
            bm = jnp.dot(a.astype(mdt).reshape(h_len * 2 * whi, cin),
                         w2_ref[...], preferred_element_type=f32,
                         precision=prec)
            cm = jnp.maximum(bm * bn2_s + bn2_b, 0).astype(
                cbuf.dtype).reshape(h_len, 2 * whi, mid)
            rows = pl.ds(fbase + k, h_len)
            cbuf[rows, hbE:hbE + wo, :] = cm[:, 0:wo, :]
            cbuf[rows, hbO:hbO + wo, :] = cm[:, whi:whi + wo, :]

            # W taps, E-half output only (the O columns die in the
            # decimation), in place over halo-row chunks: each chunk loads
            # its rows as an f32 VALUE before writing, and W taps never mix
            # rows, so ascending chunks are safe.
            hpc = -(-hp // hs)
            for hi in range(hs):
                r0 = hi * hpc
                rn = min(hpc, hp - r0)
                if rn <= 0:
                    break
                cc = cbuf[pl.ds(fbase + r0, rn), :, :].astype(f32)
                wv = None
                for j in range(taps_n):
                    d = j - k
                    p_src = d % 2
                    o = (d - p_src) // 2
                    base = (hbO if p_src else hbE) + o
                    term = vt2_ref[2 + 2 * taps_n + j, :].reshape(
                        1, 1, mid) * cc[:, base:base + wop, :]
                    wv = term if wv is None else wv + term
                cbuf[pl.ds(fbase + r0, rn), hbE:hbE + wop, :] = wv.astype(
                    cbuf.dtype)

        each_clip(ab_clip)

    @pl.when(s >= t_len)
    def _phase_c():
        t = s - t_len
        hoc = -(-ho // hs)
        chunks = []
        for hi in range(hs):
            r0 = hi * hoc
            if r0 < ho:
                chunks.append((r0, min(hoc, ho - r0)))

        def compute_vd(gi, r0, rn):
            """Decimated shifted activation for output rows [r0, r0+rn):
            T taps (stride 1) over the chunk's halo-row window, then H taps
            via a parity split of the rows (source row 2r + j = parity
            j mod 2, half-row r + j//2). The E-half columns were W-tapped in
            phase AB. All slices are unit-stride f32 VALUE slices."""
            cbase = gi * fhp
            un2 = 2 * rn + 2 * k
            u = None
            for l in range(taps_n):
                term = vt2_ref[2 + l, :].reshape(1, 1, mid) * (
                    cbuf[pl.ds(cbase + (t + l) * hp + 2 * r0, un2),
                         hbE:hbE + wce, :].astype(f32)
                )
                u = term if u is None else u + term
            u4 = u.reshape(un2 // 2, 2, wce, mid)
            v = None
            for j in range(taps_n):
                src = u4[:, j % 2]
                term = vt2_ref[2 + taps_n + j, :].reshape(1, 1, mid) * (
                    src[j // 2:j // 2 + rn]
                )
                v = term if v is None else v + term
            return v[:, 0:wop, :]

        def finish(gi, r0, vd):
            e = jnp.dot(vd.astype(mdt).reshape(
                vd.shape[0] * wop, mid), w3_ref[...],
                preferred_element_type=f32, precision=prec)
            res = e.reshape(vd.shape[0], wop, mid) + scbuf[
                pl.ds(gi * tho + t * ho + r0, vd.shape[0])]
            out_ref[gi, pl.ds(r0, vd.shape[0])] = (
                res[:, :wo, :].astype(out_dtype))

        def c_clip(gi):
            if se_ref is None:
                for r0, rn in chunks:
                    finish(gi, r0, compute_vd(gi, r0, rn))
            else:
                # SE gate needs the full-frame spatial mean of the decimated
                # activation: stage chunks in vdbuf, gate, then finish.
                ssum = None
                for r0, rn in chunks:
                    vd = compute_vd(gi, r0, rn)
                    vdbuf[pl.ds(r0, rn)] = vd
                    part = jnp.sum(vd[:, :wo, :], axis=(0, 1))
                    ssum = part if ssum is None else ssum + part
                gate = gate_from_mean(
                    ssum.reshape(1, mid) * (1.0 / (ho * wo)))
                for r0, rn in chunks:
                    finish(gi, r0,
                           vdbuf[pl.ds(r0, rn)] * gate.reshape(1, 1, mid))

        each_clip(c_clip)


def _kernel_no_se(x_ref, vt1_ref, vt2_ref, w2_ref, w3_ref, wsc_ref, out_ref,
                  cbuf, scbuf, **kw):
    _kernel(x_ref, vt1_ref, vt2_ref, w2_ref, w3_ref, wsc_ref, None, out_ref,
            cbuf, scbuf, None, **kw)


def fused_entry_run(x, params, se=None, *, max_shift, interpret=None,
                    group=None):
    """Apply one fused strided entry block.

    Args:
      x: (N, T, H, W, Cin) activation (bf16 or f32), H and W even.
      params: (vt1, vt2, w2, w3, wsc) from stack_entry_params.
      se: optional (2, Cmid, Cr) f32 squeeze-excitation weights.
      max_shift: static K bound on the integer part of the shifts.

    Returns (N, T, H//2, W//2, Cmid).
    """
    vt1, vt2, w2, w3, wsc = params
    n, t_len, h_len, w_len, cin = x.shape
    mid = w2.shape[1]
    assert h_len % 2 == 0 and w_len % 2 == 0, (h_len, w_len)
    assert vt1.shape == (2, cin), vt1.shape
    taps_n = (vt2.shape[0] - 2) // 3
    assert vt2.shape == (2 + 3 * taps_n, mid), vt2.shape
    assert w2.shape == (cin, mid) and w3.shape == (mid, mid), (
        w2.shape, w3.shape)
    assert wsc.shape == (cin, mid), wsc.shape
    k = max_shift
    plan = pick_entry_plan(x.shape, mid, k, x.dtype, se is not None)
    assert plan is not None, ("entry block too large for VMEM", x.shape)
    sdtype, hs = plan
    g = group if group is not None else pick_entry_group(
        x.shape, mid, k, x.dtype, sdtype, se is not None, hs)
    assert g >= 1 and n % g == 0, (n, g)
    k, ho, wo, wop, whi, wce, sh, hbE, hbO, wph, tp, hp = _entry_geometry(
        x.shape, mid, k, x.dtype, sdtype)

    # De-interleave W into [even | odd] halves (XLA-side: strided slices
    # are only illegal inside the kernel), zero-padding each half to the
    # sublane-tile-aligned width whi.
    pad = whi - wo
    xE = x[..., 0::2, :]
    xO = x[..., 1::2, :]
    if pad:
        pads = [(0, 0)] * 5
        pads[3] = (0, pad)
        xE = jnp.pad(xE, pads)
        xO = jnp.pad(xO, pads)
    x4 = jnp.concatenate([xE, xO], axis=3).reshape(
        n, t_len * h_len, 2 * whi, cin)

    kernel = functools.partial(
        _kernel if se is not None else _kernel_no_se,
        g_len=g, t_len=t_len, h_len=h_len, w_len=w_len, cin=cin, mid=mid,
        k=k, taps_n=taps_n, hs=hs, ho=ho, wo=wo, wop=wop, whi=whi, wce=wce,
        sh=sh, hbE=hbE, hbO=hbO, wph=wph, tp=tp, hp=hp, out_dtype=x.dtype,
    )
    in_specs = [
        pl.BlockSpec(
            (g, h_len, 2 * whi, cin),
            lambda i, s: (i, jnp.minimum(s, t_len - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # vt1
        pl.BlockSpec(memory_space=pltpu.VMEM),  # vt2
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wsc
    ]
    inputs = [x4, vt1, vt2, w2, w3, wsc]
    if se is not None:
        assert se.ndim == 3 and se.shape[:2] == (2, mid), se.shape
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(se)

    def out_index(i, s):
        return (i, jnp.maximum(s - t_len, 0), 0, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n // g, 2 * t_len),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, ho, wo, mid), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_len * ho, wo, mid), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * tp * hp, wph, mid), sdtype),   # halo buffers
            pltpu.VMEM((g * t_len * ho, wop, mid), jnp.float32),  # shortcut
        ] + ([pltpu.VMEM((ho, wop, mid), jnp.float32)]     # staged vd (SE)
             if se is not None else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_entry_vmem_bytes(x.shape, mid, max_shift, x.dtype,
                                          sdtype, se is not None, hs=hs,
                                          g=g) * 1.1),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * t_len * 2 * h_len * 2 * whi * (2 * cin * mid
                                                     + mid * mid),
            bytes_accessed=x4.size * x4.dtype.itemsize
            + n * t_len * ho * wo * mid * jnp.dtype(x.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(*inputs)
    return out.reshape(n, t_len, ho, wo, mid)


def stack_entry_params(p, s, dtype, max_shift, quantize=False):
    """Fold one entry block's params into the kernel's arrays.

    p/s: the block's 'params'/'batch_stats' subtrees (keys bn1, conv2, bn2,
    as3/rubiks3d/shift, conv3, shortcut). Returns (vt1, vt2, w2, w3, wsc);
    SE weights go through fused_block.stack_se_params (take [0])."""
    from ..conv_backend import _shift_kernel

    s1, b1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                     s["bn1"]["mean"], s["bn1"]["var"])
    s2, b2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                     s["bn2"]["mean"], s["bn2"]["var"])
    shift = p["as3"]["rubiks3d"]["shift"].astype(dtype)  # (3, mid)
    # Fractional mode: the offset-(K+1) tap is identically zero — trimmed.
    # Quantize mode keeps all 2K+2 taps: rounding can place the one-hot at
    # offset K+1 for shifts in (K+0.5, K+1] (see fused_block.py).
    tn = 2 * max_shift + 2 if quantize else 2 * max_shift + 1
    taps = jnp.concatenate([
        _shift_kernel(shift[0], dtype, max_shift, quantize)[:tn],
        _shift_kernel(shift[1], dtype, max_shift, quantize)[:tn],
        _shift_kernel(shift[2], dtype, max_shift, quantize)[:tn],
    ]).astype(jnp.float32)
    cin = p["conv2"]["kernel"].shape[2]
    mid = p["conv2"]["kernel"].shape[3]
    vt1 = jnp.stack([s1, b1]).astype(jnp.float32)
    vt2 = jnp.concatenate(
        [jnp.stack([s2, b2]).astype(jnp.float32), taps])
    w2 = p["conv2"]["kernel"].reshape(cin, mid).astype(dtype)
    w3 = p["conv3"]["kernel"].reshape(mid, mid).astype(dtype)
    wsc = p["shortcut"]["kernel"].reshape(cin, mid).astype(dtype)
    return vt1, vt2, w2, w3, wsc

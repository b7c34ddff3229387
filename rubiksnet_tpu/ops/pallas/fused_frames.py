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
    (value-load, tap, store back) — this replaces the whole-clip kernel's
    separate W-shifted scratch, whose extra ~36 MB is what pushed 112^2
    clips out of VMEM;
  phase C (T steps): T/H taps (factored diagonal matmuls on the MXU, or VPU
    multiply-adds), the SE gate, the conv3 matmul, and the shortcut add.

Frames advance as *grid iterations*, not unrolled Python loops, so the
compiled body stays one frame's worth of code — the unrolled per-frame
schedule this replaces sent this runtime's Mosaic into an apparently
unbounded compile; that path has since been removed from fused_block.py).

When even one frame's f32 temporaries overflow VMEM (stage0: 112^2 rows),
each phase additionally iterates W SPLITS inside the step (unrolled Python
loop, `ws` splits of `wc = Wp/ws` columns). This is safe because:
  * conv2/conv3 are 1x1 and the T/H taps never mix W columns;
  * the in-place W taps of a split read only columns >= its own write
    base + the interior offset, and later splits' sources, so ascending
    splits never read an already-written column;
  * the SE gate (a full-frame spatial mean — the reason H-tiled schedules
    could not run SE) accumulates per-split sums, with the gated conv3
    second pass reading the shifted activation from a small per-frame f32
    scratch (`vbuf`) instead of recomputing the taps.
Split geometry keeps every bf16 ref slice offset EVEN (interior base kp =
roundup(k, 2); this runtime's Mosaic miscompiles odd-offset sublane slices
of bf16 values — on-chip bisection, see fused_block.py) and every split
width a multiple of the sublane tile so (rows, wc, C) <-> (rows*wc, C)
reshapes around the matmuls stay layout-preserving; per-tap slicing happens
on f32 values only.

Why SE works here but not with H-tiling: the SE gate is a *global spatial
mean* over the frame (backbone.py SELayer), so any schedule that splits a
frame across independent grid steps cannot compute it; a per-frame step
sees the whole frame (across its unrolled splits).

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

from .fused_block import _round_up, _sub, _VMEM_LIMIT_CAP

# Leave headroom under the empirically verified ~120 MB per-kernel VMEM
# ceiling for Mosaic's own temporaries (which this estimate models
# coarsely).
_FRAMES_VMEM_BUDGET = 114 * 1024 * 1024


def _ws_geometry(t, h, w, c, k, dtype, sdtype, ws):
    """Padded geometry for a `ws`-way W-split per-frame schedule.

    Returns (wp, wc, kp, off, tp, hp, wche, wph): padded interior width,
    split width, even interior column base, tap read offset (kp - k), padded
    frame counts/heights, per-split halo load extent, and halo buffer width.
    """
    sub = _sub(dtype)
    wp = _round_up(w, sub)
    assert wp % ws == 0, (wp, ws)
    wc = wp // ws
    kp = _round_up(k, 2)
    off = kp - k
    tp = t + 2 * k + 1
    hp = h + 2 * k + 1
    wche = _round_up(wc + off + 2 * k + 1, 2)
    wph = _round_up(max(kp + w + k + 1, wp - wc + wche),
                    _sub(sdtype))
    return wp, wc, kp, off, tp, hp, wche, wph


def _plan_vmem_bytes(shape, max_shift, dtype, sdtype, ws, se, hs=1,
                     g=1) -> int:
    n, t, h, w, c = shape
    k = max_shift
    wp, wc, kp, off, tp, hp, wche, wph = _ws_geometry(
        t, h, w, c, k, dtype, sdtype, ws)
    itemsize = jnp.dtype(dtype).itemsize
    sitem = jnp.dtype(sdtype).itemsize
    cp = _round_up(c, 128)
    acc = g * t * h * wp * cp * itemsize
    cbuf = g * tp * hp * wph * cp * sitem
    io = 4 * g * h * wp * cp * itemsize  # double-buffered per-frame in + out
    weights = 4 * cp * cp * itemsize
    vbuf = g * h * wp * cp * 4 if (se and ws > 1) else 0
    # Phases are disjoint @pl.when branches; budget each phase's largest
    # temporaries (they can coexist across Mosaic's scheduling windows).
    # Phase B/C temporaries shrink with the H-chunk count `hs` (rows are the
    # untiled major dim, so chunking them costs no alignment padding). The
    # clip loop is a fori_loop, so temporaries stay one clip's worth
    # regardless of the group size.
    hpc = -(-hp // hs)
    hc = -(-h // hs)
    a_temps = h * wp * cp * (4 + 2 * itemsize)  # bm f32 + a/cm compute dtype
    b_temps = 2 * hpc * wche * cp * 4
    c_temps = (2 * (hc + 2 * k + 1) * wc * cp * 4
               + 2 * hc * wc * cp * 4)
    return acc + cbuf + io + weights + vbuf + a_temps + b_temps + c_temps


def pick_frames_group(shape, max_shift, dtype, sdtype, ws, hs, se) -> int:
    """Clips per grid step: largest power-of-two divisor of N (<= the
    RUBIKS_FUSED_GROUP cap, default 8) whose buffers fit VMEM.

    Grouping amortizes the fixed per-grid-step cost (~10us on v5e; see
    fused_block.pick_group) — the ungrouped schedule runs N * B * 3T tiny
    steps (3072 for Large stage1 at bs64), which dominates its runtime."""
    n = shape[0]
    gmax = int(os.environ.get("RUBIKS_FUSED_GROUP", "8"))
    g = 1 << (max(min(gmax, n), 1).bit_length() - 1)
    while g > 1:
        if n % g == 0 and _plan_vmem_bytes(
                shape, max_shift, dtype, sdtype, ws, se, hs=hs,
                g=g) <= _FRAMES_VMEM_BUDGET:
            return g
        g //= 2
    return 1


def _ws_candidates(w, dtype):
    """W split counts whose split width keeps sublane-tile alignment."""
    sub = _sub(dtype)
    wp = _round_up(w, sub)
    out = []
    for ws in range(1, wp // sub + 1):
        if wp % ws == 0 and (wp // ws) % sub == 0 and (wp // ws) % 2 == 0:
            out.append(ws)
    return out


# H-chunk candidates for ws=1 plans: rows are the untiled major dim, so any
# chunk count works; small counts keep per-chunk ops large.
_HS_CANDIDATES = (1, 2, 4, 8, 16)


def pick_frames_plan(shape, max_shift, dtype, se=False):
    """(scratch dtype, W splits, H chunks) for the per-frame schedule, or
    None.

    Preference order: no W splits with the fewest H chunks (H chunking has
    no alignment cost and keeps whole-frame-width matmuls; W splits
    multiply small-matmul issue count), f32 scratch before the compute
    dtype (exact tap math, no conversions), then the legacy W-split plans.
    """
    if jnp.dtype(dtype).itemsize >= 4:
        sdtypes = [dtype]
    else:
        sdtypes = [jnp.float32, dtype]
    for sd in sdtypes:
        for hs in _HS_CANDIDATES:
            if _plan_vmem_bytes(shape, max_shift, dtype, sd, 1, se,
                                hs=hs) <= _FRAMES_VMEM_BUDGET:
                return sd, 1, hs
    for ws in _ws_candidates(shape[3], dtype):
        if ws == 1:
            continue
        for sd in sdtypes:
            if _plan_vmem_bytes(shape, max_shift, dtype, sd, ws,
                                se) <= _FRAMES_VMEM_BUDGET:
                return sd, ws, 1
    return None


def pick_frames_sdtype(shape, max_shift, dtype):
    """Back-compat: scratch dtype of the unsplit (ws=1) schedule, or None."""
    if jnp.dtype(dtype).itemsize >= 4:
        sdtypes = [dtype]
    else:
        sdtypes = [jnp.float32, dtype]
    for sd in sdtypes:
        if _plan_vmem_bytes(shape, max_shift, dtype, sd, 1,
                            False) <= _FRAMES_VMEM_BUDGET:
            return sd
    return None


def fused_frames_supported(shape, max_shift, dtype, aq=False,
                           se=False) -> bool:
    if aq or jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    return pick_frames_plan(shape, max_shift, dtype, se=se) is not None


def _kernel(
    x_ref, vt_ref, wm_ref, se_ref, out_ref, acc, cbuf, vbuf,
    *, g_len, nb, t_len, h_len, w_len, c, k, taps_n, ws, hs, wp, wc, kp, off,
    tp, hp, wche, wph, out_dtype, mxu_taps=True,
):
    b = pl.program_id(1)
    s = pl.program_id(2)
    f32 = jnp.float32
    th = t_len * h_len
    fhp = tp * hp  # halo rows per clip
    first = jnp.logical_and(pl.program_id(0) == 0,
                            jnp.logical_and(b == 0, s == 0))

    def each_clip(body):
        # Clips of the group iterate via fori_loop (dynamic row bases into
        # the flattened rank-3 scratch), so the compiled phase body stays one
        # clip's worth of code regardless of the group size.
        jax.lax.fori_loop(0, g_len, lambda gi, _: (body(gi), 0)[1], 0)

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

    def gate_from_mean(m):
        """Squeeze-excitation gate (1, c) from the frame's spatial mean of
        the shifted activation (backbone.py SELayer: fc-relu-fc,
        sigmoid)."""
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
        @pl.when(b == 0)
        def _load():
            def load_clip(gi):
                rows = pl.ds(gi * th + s * h_len, h_len)
                if wp > w_len:
                    acc[rows, w_len:wp, :] = jnp.zeros(
                        (h_len, wp - w_len, c), acc.dtype
                    )
                acc[rows, 0:w_len, :] = x_ref[gi].astype(acc.dtype)

            each_clip(load_clip)

        def a_clip(gi):
            rows = pl.ds(gi * th + s * h_len, h_len)
            fbase = gi * fhp + (k + s) * hp
            # Fresh zero borders every block: the previous block's in-place
            # W-taps (phase B) left non-zero values outside the interior.
            cbuf[pl.ds(fbase, hp)] = jnp.zeros((hp, wph, c), cbuf.dtype)
            for wi in range(ws):
                cs = wi * wc
                a = jnp.maximum(acc[rows, cs:cs + wc, :] * bn1_s + bn1_b, 0)
                bm = jnp.dot(a.reshape(h_len * wc, c), w2,
                             preferred_element_type=f32)
                cm = jnp.maximum(bm * bn2_s + bn2_b, 0).astype(cbuf.dtype)
                wcv = min(wc, w_len - cs)
                if wcv > 0:
                    cbuf[pl.ds(fbase + k, h_len),
                         kp + cs : kp + cs + wcv, :] = cm.reshape(
                             h_len, wc, c)[:, :wcv, :]

        each_clip(a_clip)

    @pl.when(jnp.logical_and(s >= t_len, s < 2 * t_len))
    def _phase_b():
        def b_clip(gi):
            fbase = gi * fhp + (s - t_len + k) * hp
            # W taps never mix rows, so H chunks (row ranges of the halo
            # frame, major-dim slices: no alignment constraints) bound the
            # f32 temporaries without W splitting.
            hpc = -(-hp // hs)
            for wi in range(ws):
                cs = wi * wc
                for hi in range(hs):
                    r0 = hi * hpc
                    rn = min(hpc, hp - r0)
                    if rn <= 0:
                        break
                    # Halo slice loaded whole, taps sliced from the f32
                    # VALUE (bf16 value slices at odd sublane offsets
                    # miscompile).
                    cc = cbuf[pl.ds(fbase + r0, rn),
                              cs:cs + wche, :].astype(f32)
                    wv = None
                    for j in range(taps_n):
                        term = vt_ref[0, 4 + 2 * taps_n + j, :].reshape(
                            1, 1, c) * cc[:, off + j : off + j + wc, :]
                        wv = term if wv is None else wv + term
                    # In-place: split wi writes [cs, cs+wc); its own reads
                    # came from the value above, and later splits read
                    # >= cs + wc + off.
                    cbuf[pl.ds(fbase + r0, rn), cs:cs + wc, :] = wv.astype(
                        cbuf.dtype)

        each_clip(b_clip)

    @pl.when(s >= 2 * t_len)
    def _phase_c():
        t = s - 2 * t_len

        def compute_v(gi, wi, r0, rn):
            """T/H taps for clip gi, split wi, output rows [r0, r0+rn):
            (rn, wc, c) f32. Needs u rows [r0, r0 + rn + taps_n - 1) of each
            tap frame (row/major-dim slices: no alignment constraints)."""
            cs = wi * wc
            un = rn + taps_n - 1
            cbase = gi * fhp
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
                    u_l = cbuf[pl.ds(cbase + (t + l) * hp + r0, un),
                               cs:cs + wc, :].astype(acc.dtype)
                    term = jnp.dot(u_l.reshape(un * wc, c), d,
                                   preferred_element_type=f32)
                    u_acc = term if u_acc is None else u_acc + term
                u1 = u_acc.reshape(un, wc, c).astype(acc.dtype)
                v_acc = None
                for j in range(taps_n):
                    d = (eye * vt_ref[0, 4 + taps_n + j, :].reshape(1, c)
                         ).astype(acc.dtype)
                    term = jnp.dot(
                        u1[j : j + rn].reshape(rn * wc, c), d,
                        preferred_element_type=f32,
                    )
                    v_acc = term if v_acc is None else v_acc + term
                return v_acc.reshape(rn, wc, c)
            u = None
            for l in range(taps_n):
                term = vt_ref[0, 4 + l, :].reshape(1, 1, c) * (
                    cbuf[pl.ds(cbase + (t + l) * hp + r0, un),
                         cs:cs + wc, :].astype(f32)
                )
                u = term if u is None else u + term
            v = None
            for j in range(taps_n):
                term = vt_ref[0, 4 + taps_n + j, :].reshape(1, 1, c) * (
                    u[j : j + rn]
                )
                v = term if v is None else v + term
            return v

        def finish(gi, wi, r0, v, gate):
            cs = wi * wc
            rn = v.shape[0]
            if gate is not None:
                v = v * gate.reshape(1, 1, c)
            e = jnp.dot(v.astype(acc.dtype).reshape(rn * wc, c), w3,
                        preferred_element_type=f32)
            arows = pl.ds(gi * th + t * h_len + r0, rn)
            new = acc[arows, cs:cs + wc, :] + e.reshape(
                rn, wc, c).astype(acc.dtype)
            acc[arows, cs:cs + wc, :] = new
            wcv = min(wc, w_len - cs)
            if wcv > 0:
                @pl.when(b == nb - 1)
                def _out():
                    out_ref[gi, pl.ds(r0, rn), cs:cs + wcv, :] = (
                        new[:, :wcv, :].astype(out_dtype))

        hc = -(-h_len // hs)
        chunks = []
        for hi in range(hs):
            r0 = hi * hc
            if r0 < h_len:
                chunks.append((r0, min(hc, h_len - r0)))

        inv_hw = 1.0 / (h_len * w_len)

        def c_clip(gi):
            if se_ref is None:
                for wi in range(ws):
                    for r0, rn in chunks:
                        finish(gi, wi, r0, compute_v(gi, wi, r0, rn), None)
            elif ws == 1 and hs == 1:
                v = compute_v(gi, 0, 0, h_len)
                m = jnp.sum(v[:, :w_len, :], axis=(0, 1)).reshape(
                    1, c) * inv_hw
                finish(gi, 0, 0, v, gate_from_mean(m))
            elif hs > 1:
                # SE gate needs the full-frame mean of the shifted
                # activation; with H chunks the taps are computed twice
                # (mean pass + gated pass) instead of staging a frame-sized
                # f32 buffer.
                ssum = None
                for r0, rn in chunks:
                    part = jnp.sum(
                        compute_v(gi, 0, r0, rn)[:, :w_len, :], axis=(0, 1))
                    ssum = part if ssum is None else ssum + part
                gate = gate_from_mean(ssum.reshape(1, c) * inv_hw)
                for r0, rn in chunks:
                    finish(gi, 0, r0, compute_v(gi, 0, r0, rn), gate)
            else:
                vrows = pl.ds(gi * h_len, h_len)
                ssum = None
                for wi in range(ws):
                    v = compute_v(gi, wi, 0, h_len)
                    vbuf[vrows, wi * wc : wi * wc + wc, :] = v
                    wcv = min(wc, w_len - wi * wc)
                    if wcv > 0:
                        part = jnp.sum(v[:, :wcv, :], axis=(0, 1))
                        ssum = part if ssum is None else ssum + part
                gate = gate_from_mean(ssum.reshape(1, c) * inv_hw)
                for wi in range(ws):
                    finish(gi, wi, 0, vbuf[vrows, wi * wc : wi * wc + wc, :],
                           gate)

        each_clip(c_clip)


def _kernel_no_se(x_ref, vt_ref, wm_ref, out_ref, acc, cbuf, **kw):
    _kernel(x_ref, vt_ref, wm_ref, None, out_ref, acc, cbuf, None, **kw)


def _kernel_se_ws1(x_ref, vt_ref, wm_ref, se_ref, out_ref, acc, cbuf, **kw):
    _kernel(x_ref, vt_ref, wm_ref, se_ref, out_ref, acc, cbuf, None, **kw)


def fused_frames_run(x, vt, wm, se=None, *, max_shift, mxu_taps=None,
                     interpret=None, ws=None, hs=None, group=None):
    """Apply a chain of B fused blocks, one frame of a clip group per grid
    step.

    Same contract as fused_block.fused_block_run (minus AQ): x is
    (N, T, H, W, C); vt/wm/se as produced by stack_block_params /
    stack_se_params. Returns (N, T, H, W, C). `ws`/`hs` override the picked
    W-split / H-chunk counts (testing only); `group` overrides the picked
    clips-per-grid-step count.
    """
    n, t_len, h_len, w_len, c = x.shape
    nb = vt.shape[0]
    plan = pick_frames_plan(x.shape, max_shift, x.dtype, se=se is not None)
    assert plan is not None, ("shape too large even per frame", x.shape)
    sdtype, ws_pick, hs_pick = plan
    if ws is None:
        ws = ws_pick
        if hs is None:
            hs = hs_pick
    if hs is None:
        hs = 1
    assert ws == 1 or hs == 1, ("W splits and H chunks are exclusive",
                                ws, hs)
    if group is None:
        group = pick_frames_group(x.shape, max_shift, x.dtype, sdtype, ws,
                                  hs, se is not None)
    assert group >= 1 and n % group == 0, (n, group)
    k = max_shift
    wp, wc, kp, off, tp, hp, wche, wph = _ws_geometry(
        t_len, h_len, w_len, c, k, x.dtype, sdtype, ws)
    # Tap count from the stacked params (the offset-(K+1) tap is trimmed
    # as identically zero by stack_block_params; see fused_block.py).
    taps_n = (vt.shape[1] - 4) // 3
    assert vt.shape == (nb, 4 + 3 * taps_n, c) and 1 <= taps_n <= 2 * k + 2, (
        vt.shape, taps_n)
    assert wm.shape == (nb, 2, c, c), wm.shape
    if mxu_taps is None:
        env = os.environ.get("RUBIKS_FUSED_MXU_TAPS", "0")
        if env in ("0", "1"):
            mxu_taps = env == "1"
        else:  # "auto": per-shape heuristic, kept for A/B only
            # Default VPU taps, same measured rule as fused_block_run
            # (MODEL_AB_R5.json: force-VPU 1.181x e2e median).
            mxu_taps = sdtype != jnp.float32

    use_vbuf = se is not None and ws > 1
    g = group
    x4 = x.reshape(n, t_len * h_len, w_len, c)
    if se is not None and not use_vbuf:
        kernel_fn = _kernel_se_ws1
    elif se is not None:
        kernel_fn = _kernel
    else:
        kernel_fn = _kernel_no_se
    kernel = functools.partial(
        kernel_fn,
        g_len=g, nb=nb, t_len=t_len, h_len=h_len, w_len=w_len, c=c, k=k,
        taps_n=taps_n, ws=ws, hs=hs, wp=wp, wc=wc, kp=kp, off=off, tp=tp,
        hp=hp, wche=wche, wph=wph, out_dtype=x.dtype, mxu_taps=mxu_taps,
    )
    in_specs = [
        pl.BlockSpec(
            (g, h_len, w_len, c),
            lambda i, b, s: (i, jnp.minimum(s, t_len - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, 4 + 3 * taps_n, c), lambda i, b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, c, c), lambda i, b, s: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x4, vt, wm]
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
        return (i, f, 0, 0)

    scratch_shapes = [
        pltpu.VMEM((g * t_len * h_len, wp, c), x.dtype),  # clip accumulators
        pltpu.VMEM((g * tp * hp, wph, c), sdtype),        # halo buffers
    ]
    if use_vbuf:
        # Per-frame shifted activation, staged for the gated conv3 pass.
        scratch_shapes.append(pltpu.VMEM((g * h_len, wp, c), jnp.float32))

    n_matmuls = (1 + 2 * taps_n + 1) if mxu_taps else 2
    flops_per_step = g * (
        n_matmuls * 2 * h_len * wp * c * c
        + (1 if mxu_taps else 3) * taps_n * 2 * hp * wph * c
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // g, nb, 3 * t_len),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, h_len, w_len, c), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_len * h_len, w_len, c),
                                       x.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(int(_plan_vmem_bytes(x.shape, max_shift, x.dtype,
                                         sdtype, ws, se is not None,
                                         hs=hs, g=g) * 1.1),
                    32 * 1024 * 1024),
                _VMEM_LIMIT_CAP,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(n // g) * nb * t_len * flops_per_step,
            bytes_accessed=2 * x4.size * x4.dtype.itemsize
            + n * nb * 2 * c * c * jnp.dtype(x.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(*inputs)
    return out.reshape(n, t_len, h_len, w_len, c)

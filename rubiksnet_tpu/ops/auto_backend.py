"""Per-shape shift-backend auto-selection.

``backend="auto"`` picks the measured-fastest *correct* path per call shape
(shapes are static under jit) instead of a caller-picked string — the
reference always had exactly one path (cuda_src/rubiks3d_kernels.cu).

Measured table: SHIFT_MICROBENCH.json (round-5 re-capture with the fixed
paired-digest estimator — the pre-round-5 table was fetch-noise and routed
the forward/input-grad to a Pallas kernel that actually loses 2-8x at every
clean cell). Current rules:

  forward     -> 'mix' everywhere (T slab FMAs + per-frame H/W depthwise
                 convs; e2e evidence in MODEL_AB_FALLBACK.json)
  input grad  -> dilated select-unroll everywhere
  shift grad  -> one-pass Pallas (3, C) reduction at >= OCCUPANCY_MIN lane
                 occupancy (isolated cell: 4.15 ms vs select 4.75 ms at
                 stage3), select below it

Gather stays available for unbounded shifts but is never auto-picked: every
production config has checkpoint-autosized max_shift.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# Minimum channel lane occupancy for the one-pass Pallas shift-grad
# reduction to win its lane-wasting slices (C=288/576 occupancies >= 0.75
# win; C=72/144 lose — SHIFT_MICROBENCH.json shift_grad cells).
OCCUPANCY_MIN = 0.7
# ... and minimum spatial extent: the kernel's per-grid-step fixed cost
# dominates tiny frames (stage4 7x7x576: select 0.034 ms vs pallas 2.117;
# stage3 14x14x288: pallas 4.15 vs select 4.75 — SHIFT_MICROBENCH.json).
SHIFT_GRAD_MIN_HW = 128


def lane_occupancy(c: int) -> float:
    return c / (-(-c // 128) * 128)


def choose_forward_backend(shape, stride, padding, quantize, max_shift,
                           dtype) -> str:
    """Backend for rubiks_shift_3d_forward under backend='auto'.

    Default 'mix' everywhere (T taps as layout-neutral slab FMAs, H/W as
    per-frame depthwise convs): under the fixed round-5 timing estimator it
    matches conv at every isolated cell (SHIFT_MICROBENCH.json) and beats it
    1.055x end-to-end (MODEL_AB_FALLBACK.json — the all-conv formulation's
    3-spatial-dim T conv makes XLA transpose the whole stage0 activation;
    all-select measured 0.61x). The one-pass Pallas forward kernel, which
    the pre-round-5 heuristic picked at >=0.7 lane occupancy, measured
    SLOWER at every clean cell (stage3 4.16x, stage1 2.11x, stage4 3.7x —
    the round-2 capture that motivated it was fetch-noise) and is never
    auto-picked; it remains available as an explicit backend string.
    """
    return os.environ.get("RUBIKS_SHIFT3D_FALLBACK", "mix")


def choose_input_grad_backend(og_shape, in_shape, stride, padding, quantize,
                              max_shift, dtype) -> str:
    """Backend for the input gradient (inverse shift) under 'auto'.

    Always the dilated select-unroll: the one-pass Pallas inverse kernel
    (picked at >=0.7 occupancy before round 5) loses in the full-backward
    composition at every clean cell — stage3 bwd conv/select 1.787 ms vs
    the pallas-grads path 2.479 ms, stage4 0.211 vs 1.559
    (SHIFT_MICROBENCH.json; the fwd+input-grad cell DCEs the unused shift
    grad, so it isolates exactly this choice)."""
    return "select"


def choose_shift_grad_backend(x_shape, og_shape, stride, padding, max_shift,
                              dtype) -> str:
    """Backend for the (3, C) shift-gradient reduction under 'auto'.

    The one-pass Pallas reduction kernel (ops/pallas/shift_grad_kernel.py)
    reads x and the upstream gradient once; the XLA select-unroll taps
    (static slices) materialize ~8 full-clip intermediates in HBM. Pallas
    wins whenever it applies and the lanes are reasonably occupied
    (round-5 clean isolated cells: 4.15 vs 4.75 ms at stage3 C=288);
    'select' remains the fallback (it beats gather at every measured
    shape)."""
    from .pallas.shift_grad_kernel import shift_grad_pallas_supported

    if shift_grad_pallas_supported(x_shape, og_shape, stride, padding, dtype,
                                   max_shift) \
            and lane_occupancy(x_shape[-1]) >= OCCUPANCY_MIN \
            and x_shape[-3] * x_shape[-2] >= SHIFT_GRAD_MIN_HW:
        return "pallas"
    return "select"

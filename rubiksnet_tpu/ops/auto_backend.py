"""Per-shape shift-backend auto-selection.

The interchangeable shift backends (gather / conv / select / pallas, see
ops/shift3d.py) have crossing cost curves on TPU: the one-pass Pallas kernel
wins when the channel count fills the 128-wide vector lanes (its tap stages
run on raw VMEM slices), while at low lane occupancy the XLA conv
formulation — which XLA tiles with better lane packing — wins despite its
three activation round-trips. ``backend="auto"`` picks per call shape so the
fastest *correct* path is the default everywhere, instead of a caller-picked
string (measured table: SHIFT_MICROBENCH.json; reference always had exactly
one path, cuda_src/rubiks3d_kernels.cu).

The heuristic is deliberately tiny and static (shapes are static under jit):
lane occupancy  c / roundup(c, 128)  >= OCCUPANCY_MIN  selects the Pallas
kernel when its support predicate holds; everything else takes the conv
formulation (forward) or the dilated select-unroll (gradients, where conv is
not used). Gather stays available for unbounded shifts but is never
auto-picked: every production config has checkpoint-autosized max_shift.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# Minimum channel lane occupancy for the one-pass Pallas kernel to win its
# lane-wasting slices (empirical crossover on v5e: C=144 -> 0.56 loses,
# C=288 -> 0.75 wins; see SHIFT_MICROBENCH.json).
OCCUPANCY_MIN = 0.7


def lane_occupancy(c: int) -> float:
    return c / (-(-c // 128) * 128)


def choose_forward_backend(shape, stride, padding, quantize, max_shift,
                           dtype) -> str:
    """Backend for rubiks_shift_3d_forward under backend='auto'."""
    from .pallas.shift_kernel import shift3d_pallas_supported

    if shift3d_pallas_supported(shape, stride, padding, max_shift, dtype) \
            and lane_occupancy(shape[-1]) >= OCCUPANCY_MIN:
        return "pallas"
    # Non-Pallas fallback, default 'mix' (T taps as layout-neutral slab
    # FMAs, H/W as per-frame depthwise convs): the all-conv formulation's
    # 3-spatial-dim T conv makes XLA transpose the whole stage0 activation
    # (xprof 2026-08-20: copies were 27% of the Large forward), and 'mix'
    # measured a 1.055x 5-round e2e median over it (MODEL_AB_FALLBACK.json);
    # the all-select fallback measured 0.61x (~8 extra HBM passes).
    return os.environ.get("RUBIKS_SHIFT3D_FALLBACK", "mix")


def choose_input_grad_backend(og_shape, in_shape, stride, padding, quantize,
                              max_shift, dtype) -> str:
    """Backend for the input gradient (inverse shift) under 'auto'.

    The conv string routes the input-grad through the same dilated
    select-unroll as 'select' (ops/shift3d.py), so the real choice is
    pallas-vs-select."""
    from .pallas.shift_kernel import shift3d_pallas_supported

    if (tuple(og_shape) == tuple(in_shape)
            and shift3d_pallas_supported(og_shape, stride, padding, max_shift,
                                         dtype)
            and lane_occupancy(og_shape[-1]) >= OCCUPANCY_MIN):
        return "pallas"
    return "select"


def choose_shift_grad_backend(x_shape, og_shape, stride, padding, max_shift,
                              dtype) -> str:
    """Backend for the (3, C) shift-gradient reduction under 'auto'.

    The one-pass Pallas reduction kernel (ops/pallas/shift_grad_kernel.py)
    reads x and the upstream gradient once; the XLA select-unroll taps
    (static slices) materialize ~8 full-clip intermediates in HBM. Pallas
    wins whenever it applies and the lanes are reasonably occupied; 'select'
    remains the fallback (it beats gather at every measured shape)."""
    from .pallas.shift_grad_kernel import shift_grad_pallas_supported

    if shift_grad_pallas_supported(x_shape, og_shape, stride, padding, dtype,
                                   max_shift) \
            and lane_occupancy(x_shape[-1]) >= OCCUPANCY_MIN:
        return "pallas"
    return "select"

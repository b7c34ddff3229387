"""Per-frame fused kernel (ops/pallas/fused_frames.py) vs the unfused block
composition — the big-spatial-stage analogue of test_fused_block.py. Runs in
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rubiksnet_tpu.ops.pallas.fused_block import (
    stack_block_params,
    stack_se_params,
)
from rubiksnet_tpu.ops.pallas.fused_frames import (
    fused_frames_run,
    fused_frames_supported,
)
from tests.test_fused_block import _make_blocks, _unfused


@pytest.mark.parametrize("c,max_shift", [(128, 1), (72, 2)])
def test_fused_frames_matches_unfused(c, max_shift):
    params, stats = _make_blocks(jax.random.PRNGKey(c), 2, c,
                                 max_shift - 0.2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 6, 7, c),
                          jnp.float32)
    assert fused_frames_supported(x.shape, max_shift, x.dtype)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    got = fused_frames_run(x, vt, wm, max_shift=max_shift)
    want = _unfused(params, stats, x, "conv", max_shift)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_frames_se():
    """SE works per frame (each phase-C step sees the whole frame) — the
    capability H-tiling could not provide."""
    c, max_shift, red = 144, 1, 12
    params, stats = _make_blocks(jax.random.PRNGKey(9), 2, c, 0.9,
                                 se_reduction=red)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 3, 6, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    se = stack_se_params(params)
    got = fused_frames_run(x, vt, wm, se, max_shift=max_shift)
    want = _unfused(params, stats, x, "conv", max_shift, use_se=red)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_frames_mxu_vpu_agree():
    c, max_shift = 128, 1
    params, stats = _make_blocks(jax.random.PRNGKey(13), 2, c, 0.8)
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 3, 5, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    on = fused_frames_run(x, vt, wm, max_shift=max_shift, mxu_taps=True)
    off = fused_frames_run(x, vt, wm, max_shift=max_shift, mxu_taps=False)
    np.testing.assert_allclose(
        np.asarray(on), np.asarray(off), rtol=2e-4, atol=2e-4
    )


def test_fused_frames_matches_whole_clip_kernel():
    """Where both kernels apply they must agree (same stacked params)."""
    from rubiksnet_tpu.ops.pallas.fused_block import fused_block_run

    c, max_shift = 128, 1
    params, stats = _make_blocks(jax.random.PRNGKey(5), 3, c, 0.9)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 6, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    frames = fused_frames_run(x, vt, wm, max_shift=max_shift)
    whole = fused_block_run(x, vt, wm, max_shift=max_shift)
    np.testing.assert_allclose(
        np.asarray(frames), np.asarray(whole), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("max_shift", [1, 2])
def test_fused_frames_wsplit_matches_unsplit(max_shift):
    """The W-split schedule (stage0's VMEM escape hatch) must agree with the
    unsplit one — in-place W-taps across split boundaries and the even
    interior base (kp) included."""
    c = 72
    params, stats = _make_blocks(jax.random.PRNGKey(20 + max_shift), 2, c,
                                 max_shift - 0.1)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 3, 5, 16, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    got = fused_frames_run(x, vt, wm, max_shift=max_shift, ws=2)
    want = fused_frames_run(x, vt, wm, max_shift=max_shift, ws=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    ref = _unfused(params, stats, x, "conv", max_shift)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fused_frames_wsplit_se():
    """SE across W splits: per-split sums feed one gate; the gated conv3
    second pass reads the vbuf scratch."""
    c, max_shift, red = 72, 1, 12
    params, stats = _make_blocks(jax.random.PRNGKey(30), 2, c, 0.9,
                                 se_reduction=red)
    x = jax.random.normal(jax.random.PRNGKey(31), (2, 3, 5, 16, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    se = stack_se_params(params)
    got = fused_frames_run(x, vt, wm, se, max_shift=max_shift, ws=2)
    want = _unfused(params, stats, x, "conv", max_shift, use_se=red)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_frames_stage0_plan():
    """The flagship early stages must have a plan: stage1 whole-frame,
    stage0 chunked (the shape whose f32 temporaries overflow VMEM whole)."""
    from rubiksnet_tpu.ops.pallas.fused_frames import pick_frames_plan

    sd, ws, hs = pick_frames_plan((64, 8, 56, 56, 72), 1, jnp.bfloat16,
                                  se=True)
    assert (ws, hs) == (1, 1) and sd == jnp.float32
    plan = pick_frames_plan((64, 8, 112, 112, 72), 1, jnp.bfloat16, se=True)
    assert plan is not None
    sd, ws, hs = plan
    assert ws == 1 and hs > 1  # H-chunked, no W splits


def test_fused_frames_batch_independence():
    """acc/cbuf scratch reuse across the clip grid dim must not leak."""
    c, max_shift = 128, 1
    params, stats = _make_blocks(jax.random.PRNGKey(7), 2, c, 0.9)
    vt, wm = stack_block_params(params, stats, jnp.float32, max_shift)
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 3, 5, 5, c),
                          jnp.float32)
    full = fused_frames_run(x, vt, wm, max_shift=max_shift)
    solo = fused_frames_run(x[1:2], vt, wm, max_shift=max_shift)
    np.testing.assert_allclose(
        np.asarray(full[1:2]), np.asarray(solo), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("hs,mxu", [(2, False), (3, True), (5, False)])
def test_fused_frames_h_chunked(hs, mxu):
    """H-chunked ws=1 schedule (stage0's plan class): row-chunked phases B/C
    must match the unfused chain, including non-dividing chunk counts."""
    c, max_shift = 128, 1
    params, stats = _make_blocks(jax.random.PRNGKey(21), 2, c, 0.9)
    x = jax.random.normal(jax.random.PRNGKey(22), (2, 3, 7, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    got = fused_frames_run(x, vt, wm, max_shift=max_shift, ws=1, hs=hs,
                           mxu_taps=mxu)
    want = _unfused(params, stats, x, "conv", max_shift)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_frames_h_chunked_se():
    """SE with H chunks: the gate mean accumulates across chunks and the
    taps recompute in the gated pass."""
    c, max_shift, red = 144, 1, 12
    params, stats = _make_blocks(jax.random.PRNGKey(23), 2, c, 0.9,
                                 se_reduction=red)
    x = jax.random.normal(jax.random.PRNGKey(24), (1, 3, 7, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    se = stack_se_params(params)
    got = fused_frames_run(x, vt, wm, se, max_shift=max_shift, ws=1, hs=3)
    want = _unfused(params, stats, x, "conv", max_shift, use_se=red)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


@pytest.mark.parametrize("group", [2, 3])
def test_fused_frames_grouped_matches_ungrouped(group):
    """Clip grouping (g clips per grid step, fori_loop with dynamic row
    bases) must be a pure scheduling change."""
    c, max_shift = 128, 1
    params, stats = _make_blocks(jax.random.PRNGKey(40), 2, c, 0.9)
    x = jax.random.normal(jax.random.PRNGKey(41), (group * 2, 3, 5, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    got = fused_frames_run(x, vt, wm, max_shift=max_shift, group=group)
    want = fused_frames_run(x, vt, wm, max_shift=max_shift, group=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    ref = _unfused(params, stats, x, "conv", max_shift)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fused_frames_grouped_se_hs():
    """Group x SE x H-chunk interaction: per-clip gates must not mix across
    the group's scratch regions."""
    c, max_shift, red = 144, 1, 12
    params, stats = _make_blocks(jax.random.PRNGKey(42), 2, c, 0.9,
                                 se_reduction=red)
    x = jax.random.normal(jax.random.PRNGKey(43), (4, 3, 7, 6, c),
                          jnp.float32)
    vt, wm = stack_block_params(params, stats, x.dtype, max_shift)
    se = stack_se_params(params)
    got = fused_frames_run(x, vt, wm, se, max_shift=max_shift, ws=1, hs=3,
                           group=2)
    want = _unfused(params, stats, x, "conv", max_shift, use_se=red)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )

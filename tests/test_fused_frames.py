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

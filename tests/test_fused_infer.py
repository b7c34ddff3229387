"""End-to-end: fused inference executor == regular model.apply.

Uses a tiny custom tier-like config via the real model classes (tiny tier,
small frames/size keep CPU interpret-mode runtime manageable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rubiksnet_tpu.models import create_rubiksnet
from rubiksnet_tpu.models.fused_infer import fused_infer_apply



# Model-scale tests: excluded from the fast pre-commit loop (-m "not slow").
pytestmark = pytest.mark.slow

def test_fused_infer_matches_model_tiny():
    bundle = create_rubiksnet(
        "tiny", num_classes=11, num_frames=3, input_size=32,
        shift_backend="conv", shift_max_shift=2,
    )
    video = jax.random.normal(
        jax.random.PRNGKey(0), (2, 3, 32, 32, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_infer_matches_model_small_se():
    """SE tier: stride-1 blocks fuse with the in-kernel SE gate; the
    executor must still agree with the regular apply."""
    bundle = create_rubiksnet(
        "small", num_classes=5, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=2,
    )
    video = jax.random.normal(
        jax.random.PRNGKey(1), (1, 2, 16, 16, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_infer_matches_model_aq():
    """AQ variant: attention temporal shift + 2D spatial shift fuse."""
    bundle = create_rubiksnet(
        "tiny", num_classes=7, num_frames=3, input_size=32,
        variant="rubiks3d-aq", shift_backend="conv", shift_max_shift=2,
    )
    video = jax.random.normal(
        jax.random.PRNGKey(2), (2, 3, 32, 32, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_infer_matches_model_quantize():
    """quantize=True must flow through the fused executor's tap weights
    (one-hot kernels); a silently non-quantized fused path would diverge from
    the regular apply here. Shifts are pushed into the (K+0.5, K+1] band on
    some channels so the rounded one-hot lands on the offset-(K+1) tap
    (regression: the fractional-mode tap trim silently zeroed them)."""
    bundle = create_rubiksnet(
        "tiny", num_classes=6, num_frames=3, input_size=32, quantize=True,
        shift_backend="conv", shift_max_shift=2,
    )
    hot = jnp.asarray([2.6, -0.4, 1.7, 2.51, 0.0, -2.5], jnp.float32)

    def _heat(path, leaf):
        if any(getattr(k, "key", None) == "rubiks3d" for k in path) and (
                leaf.ndim == 2 and leaf.shape[0] == 3):
            return jnp.resize(hot, leaf.shape)
        return leaf

    params = jax.tree_util.tree_map_with_path(
        _heat, dict(bundle.variables["params"]))
    bundle.variables["params"] = params
    video = jax.random.normal(
        jax.random.PRNGKey(3), (2, 3, 32, 32, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    # Quantized vs interpolated shifts genuinely differ; guard the guard.
    plain = create_rubiksnet(
        "tiny", num_classes=6, num_frames=3, input_size=32, quantize=False,
        shift_backend="conv", shift_max_shift=2,
    )
    not_quantized = plain.model.apply(bundle.variables, video, train=False)
    assert float(jnp.max(jnp.abs(want - not_quantized))) > 1e-3
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_infer_aq_quantize_falls_back():
    """AQ + quantize has no tap representation (2D half-away rounding); the
    executor must fall back to the unfused path and still be correct."""
    bundle = create_rubiksnet(
        "tiny", num_classes=4, num_frames=2, input_size=16, quantize=True,
        variant="rubiks3d-aq", shift_backend="gather", shift_max_shift=2,
    )
    video = jax.random.normal(
        jax.random.PRNGKey(4), (1, 2, 16, 16, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_infer_frames_dispatch(monkeypatch):
    """When the whole-clip kernel rejects a shape (VMEM), the executor must
    route the run through the per-frame grid-phase kernel and still agree
    with the regular apply. Forced here by stubbing out the whole-clip
    support check (real trigger is the 112^2/56^2 early stages)."""
    import rubiksnet_tpu.models.fused_infer as fi

    monkeypatch.setattr(fi, "fused_block_supported",
                        lambda *a, **kw: False)
    bundle = create_rubiksnet(
        "small", num_classes=5, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=2,
    )
    video = jax.random.normal(
        jax.random.PRNGKey(5), (1, 2, 16, 16, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_fused_eval_step_on_mesh():
    """Fused eval step composes with the sharded batch path (8-device CPU
    mesh; on real multi-chip hardware the kernel partitions over the batch
    grid dimension)."""
    import numpy as np

    from rubiksnet_tpu.parallel import mesh as pmesh
    from rubiksnet_tpu.train.steps import make_eval_step

    bundle = create_rubiksnet(
        "tiny", num_classes=5, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=1,
    )
    m = pmesh.create_mesh()
    step = jax.jit(make_eval_step(bundle.model, num_crops=1, fused=True))
    variables = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.replicated(m)),
        dict(bundle.variables),
    )
    video = np.random.RandomState(0).randn(8, 1, 2, 16, 16, 3).astype(
        np.float32
    )
    labels = np.arange(8, dtype=np.int32) % 5
    batch = pmesh.shard_batch(m, {"v": video, "l": labels})
    out = step(variables, batch["v"], batch["l"])
    ref = make_eval_step(bundle.model, num_crops=1, fused=False)(
        dict(bundle.variables), jnp.asarray(video), jnp.asarray(labels)
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_infer_entry_blocks(monkeypatch):
    """RUBIKS_FUSED_ENTRY=1 routes the stride-2 stage-entry blocks through
    the fused entry kernel; logits must match the regular apply."""
    monkeypatch.setenv("RUBIKS_FUSED_ENTRY", "1")
    bundle = create_rubiksnet(
        "small", num_classes=5, num_frames=2, input_size=32,
        shift_backend="conv", shift_max_shift=1,
    )
    video = jax.random.normal(
        jax.random.PRNGKey(4), (2, 2, 32, 32, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    got = fused_infer_apply(bundle.model, bundle.variables, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )

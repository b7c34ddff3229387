"""Cross-implementation parity: the reference torch model (run on CPU via
tests/reference_harness.py, CUDA kernels shimmed to the numpy oracle
semantics) against our JAX stack, through the REAL converter path in both
directions.

This replaces self-roundtrip converter tests with tests against the actual
reference module tree (rubiksnet/models.py:14-50, backbone.py:74-200,
attention_shift.py:6-39): a shared wrong assumption about the reference's key
layout or tensor orientation now fails loudly.
"""

import numpy as np
import pytest
import torch

from reference_harness import load_reference

from rubiksnet_tpu.models import (
    create_rubiksnet,
    export_torch_state_dict,
    from_ntchw,
    load_pretrained,
)

N, T, SIZE = 2, 2, 32
ATOL = 1e-4



# Model-scale tests: excluded from the fast pre-commit loop (-m "not slow").
pytestmark = pytest.mark.slow

def _reference_net(tier, variant, num_classes=5, seed=0):
    load_reference()
    from rubiksnet.models import RubiksNet

    torch.manual_seed(seed)
    net = RubiksNet(
        tier=tier, num_classes=num_classes, num_frames=T, variant=variant
    )
    net.eval()
    return net


def _reference_logits(net, video_ntchw):
    with torch.no_grad():
        return net(torch.from_numpy(video_ntchw)).numpy()


def _our_logits(bundle, video_ntchw):
    import jax.numpy as jnp

    video = from_ntchw(jnp.asarray(video_ntchw))
    return np.asarray(bundle(video, train=False))


@pytest.mark.parametrize(
    "tier,variant",
    [
        ("tiny", "rubiks3d"),
        ("small", "rubiks3d"),  # exercises SELayer
        ("medium", "rubiks3d"),
        ("large", "rubiks3d"),
        ("tiny", "rubiks3d-aq"),  # exercises AttentionShift + 2D shift
    ],
)
def test_reference_weights_into_ours(tier, variant, tmp_path):
    """Reference random weights -> .pth.tar -> load_pretrained -> logits must
    match the reference's own CPU forward within 1e-4."""
    net = _reference_net(tier, variant)
    ckpt = {
        "tier": tier,
        "num_classes": 5,
        "num_frames": T,
        "variant": variant,
        "model": net.state_dict(),
    }
    path = str(tmp_path / "ref.pth.tar")
    torch.save(ckpt, path)

    bundle = load_pretrained(path, shift_backend="gather")

    video = np.random.RandomState(1).randn(N, T, 3, SIZE, SIZE).astype(np.float32)
    ref = _reference_logits(net, video)
    got = _our_logits(bundle, video)
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=0)


@pytest.mark.parametrize(
    "tier,variant",
    [
        ("tiny", "rubiks3d"),
        ("small", "rubiks3d"),
        ("tiny", "rubiks3d-aq"),
    ],
)
def test_our_weights_into_reference(tier, variant):
    """Our random weights -> export_torch_state_dict -> reference
    load_state_dict(strict) -> logits must match ours within 1e-4."""
    bundle = create_rubiksnet(
        tier, num_classes=5, num_frames=T, variant=variant, input_size=SIZE,
        shift_backend="gather",
    )
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          export_torch_state_dict(bundle).items()}

    net = _reference_net(tier, variant, seed=3)
    net.load_state_dict(sd, strict=True)  # raises on any key/shape mismatch
    video = np.random.RandomState(2).randn(N, T, 3, SIZE, SIZE).astype(np.float32)
    ref = _reference_logits(net, video)
    got = _our_logits(bundle, video)
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=0)


def test_reference_shift3d_module_matches_our_op():
    """The reference RubiksShift3D module (through its host wrappers +
    autograd.Function) against our rubiks_shift_3d functional, strided."""
    load_reference()
    from rubiksnet.shiftlib import RubiksShift3D

    import jax.numpy as jnp

    from rubiksnet_tpu.ops import rubiks_shift_3d

    torch.manual_seed(1)
    layer = RubiksShift3D(6, stride=(1, 2, 2), padding=(0, 1, 1))
    x = np.random.RandomState(0).randn(2, 4, 6, 9, 9).astype(np.float32)
    with torch.no_grad():
        ref = layer(torch.from_numpy(x)).numpy()
    shift = layer.shift.detach().numpy()
    ours = rubiks_shift_3d(
        jnp.asarray(x.transpose(0, 1, 3, 4, 2)),  # -> (N, T, H, W, C)
        jnp.asarray(shift),
        stride=(1, 2, 2),
        padding=(0, 1, 1),
        backend="gather",
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 1, 4, 2, 3), ref, atol=1e-5, rtol=0
    )


@pytest.mark.parametrize(
    "tier,variant",
    [
        ("tiny", "rubiks3d"),
        ("small", "rubiks3d"),   # SE gate in-kernel
        ("tiny", "rubiks3d-aq"),  # attention shift in-kernel
    ],
)
def test_reference_weights_into_fused_executor(tier, variant, tmp_path):
    """Reference random weights through the FUSED inference executor (the
    production Pallas path) must also match the reference's CPU forward."""
    from rubiksnet_tpu.models.fused_infer import fused_infer_apply

    net = _reference_net(tier, variant, seed=5)
    ckpt = {
        "tier": tier,
        "num_classes": 5,
        "num_frames": T,
        "variant": variant,
        "model": net.state_dict(),
    }
    path = str(tmp_path / "ref.pth.tar")
    torch.save(ckpt, path)
    bundle = load_pretrained(path, shift_backend="conv")

    import jax.numpy as jnp

    video = np.random.RandomState(4).randn(N, T, 3, SIZE, SIZE).astype(
        np.float32
    )
    ref = _reference_logits(net, video)
    got = np.asarray(
        fused_infer_apply(
            bundle.model, bundle.variables, from_ntchw(jnp.asarray(video))
        )
    )
    np.testing.assert_allclose(got, ref, atol=5 * ATOL, rtol=0)

"""End-to-end dual-evaluator protocol parity on a synthetic frame-folder
dataset.

Runs the REFERENCE eval pipeline (its RubiksDataset + Group transforms +
model + crops/clips consensus, transcribed from
/root/reference/scripts/test_models.py:124-201 and executed on CPU via
tests/reference_harness.py) and OUR evaluator pipeline (rubiksnet_tpu.data +
train.steps.make_eval_step, the loop of scripts/test_models.py) on the SAME
jpeg frame folders with the same (converted) weights — both 1-clip and
2-clip protocols. This covers the sampler + crop geometry + view ordering +
consensus seam as one system, which the piecewise tests cannot.

Protocol geometry is scaled down (crop 56 / scale 64 / T=4) to keep the
CPU-shimmed reference forward tractable; every code path (samplers,
GroupScale, GroupFullResSample offsets, stacking order, consensus mean) is
size-parametric, and the 224/256 constants are covered by the transform unit
tests."""

import numpy as np
import pytest
import torch
from PIL import Image

from reference_harness import load_reference

T = 4
CROP, SCALE = 56, 64
NUM_CLASSES = 5
TMPL = "{:05d}.jpg"


@pytest.fixture(scope="module")
def frame_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    lines = []
    for vi in range(4):
        name = f"vid{vi}"
        d = root / name
        d.mkdir()
        n_frames = 12 + 2 * vi
        for f in range(1, n_frames + 1):
            # smooth-ish content so jpeg decode is stable across quality
            base = rng.randint(0, 200, (68, 96, 3)).astype(np.uint8)
            Image.fromarray(base).save(str(d / TMPL.format(f)), quality=95)
        lines.append(f"{name} {n_frames} {vi % NUM_CLASSES}")
    (root / "val.txt").write_text("\n".join(lines) + "\n")
    return root


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    """Reference random-weight tiny checkpoint shared by both evaluators."""
    load_reference()
    from rubiksnet.models import RubiksNet

    torch.manual_seed(11)
    net = RubiksNet(
        tier="tiny", num_classes=NUM_CLASSES, num_frames=T, variant="rubiks3d"
    )
    net.eval()
    path = tmp_path_factory.mktemp("ckpt") / "ref.pth.tar"
    torch.save(
        {
            "tier": "tiny",
            "num_classes": NUM_CLASSES,
            "num_frames": T,
            "variant": "rubiks3d",
            "model": net.state_dict(),
        },
        str(path),
    )
    return str(path), net


def _reference_eval(net, root, two_clips):
    """The reference evaluator loop, scripts/test_models.py:124-201."""
    import torchvision  # the shim installed by reference_harness

    from rubiksnet.dataset.core import RubiksDataset
    from rubiksnet.transforms import (
        GroupCenterCrop,
        GroupFullResSample,
        GroupNormalize,
        GroupScale,
        Stack,
        ToTorchFormatTensor,
    )

    if two_clips:
        cropping = torchvision.transforms.Compose(
            [GroupFullResSample(CROP, SCALE, flip=False)]
        )
        test_crops = 3
    else:
        cropping = torchvision.transforms.Compose(
            [GroupScale(SCALE), GroupCenterCrop(CROP)]
        )
        test_crops = 1
    ds = RubiksDataset(
        str(root),
        str(root / "val.txt"),
        num_segments=T,
        new_length=1,
        image_tmpl=TMPL,
        test_mode=True,
        remove_missing=True,
        transform=torchvision.transforms.Compose(
            [
                cropping,
                Stack(roll=False),
                ToTorchFormatTensor(div=True),
                GroupNormalize(net.input_mean, net.input_std),
            ]
        ),
        dense_sample=False,
        twice_sample=two_clips,
    )
    num_crop = test_crops * (2 if two_clips else 1)
    logits, labels = [], []
    with torch.no_grad():
        for i in range(len(ds)):
            data, label = ds[i]
            data_in = data.view(-1, 3, data.size(1), data.size(2))
            data_in = data_in.view(
                num_crop, T, 3, data_in.size(2), data_in.size(3)
            )
            rst = net(data_in).reshape(1, num_crop, -1).mean(1)
            logits.append(rst.numpy()[0])
            labels.append(label)
    return np.stack(logits), np.asarray(labels)


def _our_eval(ckpt, root, two_clips, loader="pil", device_norm=False):
    """Our evaluator pipeline, scripts/test_models.py (this repo)."""
    import jax

    from rubiksnet_tpu.data import (
        Compose,
        GroupCenterCrop,
        GroupFullResSample,
        GroupNormalize,
        GroupScale,
        NativeEvalDataset,
        RubiksDataset,
        Stack,
        ToClipArray,
        batch_iterator,
    )
    from rubiksnet_tpu.models import INPUT_MEAN, INPUT_STD, load_pretrained
    from rubiksnet_tpu.train.steps import make_eval_step

    bundle = load_pretrained(ckpt, shift_backend="gather")
    if two_clips:
        cropping = Compose([GroupFullResSample(CROP, SCALE, flip=False)])
        test_crops = 3
    else:
        cropping = Compose([GroupScale(SCALE), GroupCenterCrop(CROP)])
        test_crops = 1
    num_views = test_crops * (2 if two_clips else 1)
    transform = Compose(
        [
            cropping,
            Stack(roll=False),
            ToClipArray(div=True),
            GroupNormalize(INPUT_MEAN, INPUT_STD),
        ]
    )
    ds = RubiksDataset(
        str(root),
        str(root / "val.txt"),
        num_segments=T,
        new_length=1,
        image_tmpl=TMPL,
        test_mode=True,
        remove_missing=True,
        transform=None if loader == "native" else transform,
        dense_sample=False,
        twice_sample=two_clips,
    )
    if loader == "native":
        ds = NativeEvalDataset(
            ds, SCALE, CROP, INPUT_MEAN, INPUT_STD, two_clips=two_clips,
            out_dtype="uint8" if device_norm else "float32",
        )
    eval_step = jax.jit(make_eval_step(
        bundle.model, num_crops=num_views,
        normalize=(INPUT_MEAN, INPUT_STD) if device_norm else None,
    ))
    logits, labels = [], []
    for video, lab, valid in batch_iterator(ds, 2, num_views, T):
        out = eval_step(dict(bundle.variables), video, lab)
        n_valid = int(valid.sum())
        logits.append(np.asarray(out["logits"])[:n_valid])
        labels.append(lab[:n_valid])
    return np.concatenate(logits), np.concatenate(labels)


@pytest.mark.slow
@pytest.mark.parametrize("two_clips", [False, True],
                         ids=["1clip", "2clip_3crop"])
def test_dual_evaluator_protocol_parity(frame_root, ckpt_path, two_clips):
    path, net = ckpt_path
    ref_logits, ref_labels = _reference_eval(net, frame_root, two_clips)
    our_logits, our_labels = _our_eval(path, frame_root, two_clips)
    np.testing.assert_array_equal(ref_labels, our_labels)
    np.testing.assert_allclose(our_logits, ref_logits, atol=1e-4, rtol=0)
    np.testing.assert_array_equal(
        our_logits.argmax(1), ref_logits.argmax(1)
    )


@pytest.mark.slow
@pytest.mark.parametrize("two_clips", [False, True],
                         ids=["1clip", "2clip_3crop"])
def test_native_loader_evaluator_parity(frame_root, ckpt_path, two_clips):
    """The evaluator's production input path (native C++ decode-once
    pipeline, incl. the 2-clip multicrop) yields the same predictions as
    the PIL pipeline; logits differ only by JPEG-decode/resize rounding."""
    from rubiksnet_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built")
    path, _net = ckpt_path
    pil_logits, pil_labels = _our_eval(path, frame_root, two_clips)
    nat_logits, nat_labels = _our_eval(
        path, frame_root, two_clips, loader="native"
    )
    np.testing.assert_array_equal(pil_labels, nat_labels)
    np.testing.assert_allclose(nat_logits, pil_logits, atol=0.02, rtol=0)
    np.testing.assert_array_equal(
        nat_logits.argmax(1), pil_logits.argmax(1)
    )


@pytest.mark.slow
@pytest.mark.parametrize("two_clips", [False, True],
                         ids=["1clip", "2clip_3crop"])
def test_device_normalize_matches_host_normalize(frame_root, ckpt_path,
                                                 two_clips):
    """The production input path (raw uint8 shipped to the device, normalize
    inside the jitted step — 4x fewer host->device bytes) produces the same
    logits as host-side C++ normalization up to f32 rounding."""
    from rubiksnet_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built")
    path, _net = ckpt_path
    host_logits, host_labels = _our_eval(
        path, frame_root, two_clips, loader="native"
    )
    dev_logits, dev_labels = _our_eval(
        path, frame_root, two_clips, loader="native", device_norm=True
    )
    np.testing.assert_array_equal(host_labels, dev_labels)
    np.testing.assert_allclose(dev_logits, host_logits, atol=1e-4, rtol=0)
    np.testing.assert_array_equal(
        dev_logits.argmax(1), host_logits.argmax(1)
    )

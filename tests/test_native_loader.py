"""Native (C++/libjpeg) loader vs. the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from rubiksnet_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory):
    path = tmp_path_factory.mktemp("frames") / "f.jpg"
    arr = (np.random.RandomState(0).rand(240, 320, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=95)
    return str(path)


def _pil_reference(path, scale, crop):
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w < h:
        ow, oh = scale, int(scale * h / w)
    else:
        oh, ow = scale, int(scale * w / h)
    img = img.resize((ow, oh), Image.BILINEAR)
    x1 = int(round((ow - crop) / 2.0))
    y1 = int(round((oh - crop) / 2.0))
    return np.asarray(img.crop((x1, y1, x1 + crop, y1 + crop)))


def test_decode_matches_pil_within_rounding(jpeg):
    got = native_loader.decode_frame_u8(jpeg, 256, 224)
    ref = _pil_reference(jpeg, 256, 224)
    assert got.shape == ref.shape == (224, 224, 3)
    diff = np.abs(got.astype(int) - ref.astype(int))
    # triangle-filter resize matches PIL bilinear to rounding error
    assert diff.max() <= 2 and diff.mean() < 0.5


def test_batch_load_normalized(jpeg):
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    out = native_loader.load_frames([jpeg] * 6, 256, 224, mean, std)
    assert out.shape == (6, 224, 224, 3) and out.dtype == np.float32
    ref = (_pil_reference(jpeg, 256, 224) / 255.0 - np.asarray(mean)) / np.asarray(std)
    assert np.abs(out[0] - ref).max() < 0.02  # ±1 uint8 of rounding
    np.testing.assert_array_equal(out[0], out[5])


def test_explicit_crop_offsets(jpeg):
    out = native_loader.load_frames(
        [jpeg] * 3, 256, 224, (0, 0, 0), (1, 1, 1),
        crop_offsets=[(0, 0), (0, 0), (40, 8)],
    )
    np.testing.assert_array_equal(out[0], out[1])
    assert np.abs(out[0] - out[2]).max() > 0


def test_multicrop_matches_per_crop_load(jpeg, tmp_path):
    """Decode-once multicrop == the per-(frame,crop) path, bit for bit."""
    arr = (np.random.RandomState(1).rand(240, 320, 3) * 255).astype(np.uint8)
    second = tmp_path / "g.jpg"
    Image.fromarray(arr).save(second, quality=95)
    paths = [jpeg, str(second)]
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    offsets = [(0, 8), (60, 8), (30, 8)]
    got = native_loader.load_frames_multicrop(
        paths, 256, 224, mean, std, crop_offsets=offsets
    )
    assert got.shape == (6, 224, 224, 3)
    rep_paths = [p for _ in offsets for p in paths]
    rep_offsets = [o for o in offsets for _ in paths]
    ref = native_loader.load_frames(
        rep_paths, 256, 224, mean, std, crop_offsets=rep_offsets
    )
    np.testing.assert_array_equal(got, ref)


def test_u8_batch_matches_normalized_f32(jpeg):
    """Raw-uint8 loading + host-side normalize == the fused C++ normalize
    path (the device-normalize input pipeline's correctness contract)."""
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    f32 = native_loader.load_frames([jpeg] * 3, 256, 224, mean, std)
    u8 = native_loader.load_frames_u8([jpeg] * 3, 256, 224)
    assert u8.shape == (3, 224, 224, 3) and u8.dtype == np.uint8
    renorm = (
        u8.astype(np.float32) * np.float32(1.0 / 255.0)
        - np.asarray(mean, np.float32)
    ) / np.asarray(std, np.float32)
    np.testing.assert_allclose(renorm, f32, atol=1e-5, rtol=0)


def test_u8_multicrop_matches_per_crop(jpeg, tmp_path):
    arr = (np.random.RandomState(2).rand(240, 320, 3) * 255).astype(np.uint8)
    second = tmp_path / "h.jpg"
    Image.fromarray(arr).save(second, quality=95)
    paths = [jpeg, str(second)]
    offsets = [(0, 8), (60, 8), (30, 8)]
    got = native_loader.load_frames_multicrop_u8(
        paths, 256, 224, crop_offsets=offsets
    )
    assert got.shape == (6, 224, 224, 3) and got.dtype == np.uint8
    rep_paths = [p for _ in offsets for p in paths]
    rep_offsets = [o for o in offsets for _ in paths]
    ref = native_loader.load_frames_u8(
        rep_paths, 256, 224, crop_offsets=rep_offsets
    )
    np.testing.assert_array_equal(got, ref)


def test_u8_crop_matches_decode_frame_u8(jpeg):
    got = native_loader.load_frames_u8([jpeg], 256, 224,
                                       crop_offsets=[(12, 4)])
    ref = native_loader.decode_frame_u8(jpeg, 256, 224, 12, 4)
    np.testing.assert_array_equal(got[0], ref)


def test_multicrop_reports_oob_crop(jpeg):
    with pytest.raises(IOError):
        native_loader.load_frames_multicrop(
            [jpeg], 256, 224, (0, 0, 0), (1, 1, 1),
            crop_offsets=[(10_000, 0)],
        )


def test_missing_file_reports_failure(jpeg):
    with pytest.raises(IOError):
        native_loader.load_frames(
            ["/nonexistent/frame.jpg"], 256, 224, (0, 0, 0), (1, 1, 1)
        )

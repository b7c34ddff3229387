"""Host data-pipeline throughput: native C++ libjpeg loader vs PIL transforms.

The reference's measured input bottleneck is the PIL decode + HWC->CHW
transpose in its DataLoader workers (/root/reference/rubiksnet/transforms.py:358-362
— the comment there calls the transpose "80% of the loading time").  Our
replacement is the threaded native loader (native/rubiks_loader.cpp) driven
by NativeEvalDataset.  This script measures both paths end-to-end on
synthetic SSv2-like frame folders (427x240 JPEGs, the reference's raw frame
geometry) for the 1-clip and 2-clip eval protocols and writes
DATA_PIPELINE.json.

Usage: python scripts/data_pipeline_bench.py [--videos 24] [--out ...]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TMPL = "{:05d}.jpg"


def make_frames(root, num_videos, num_frames, w=427, h=240, quality=95):
    from PIL import Image

    rng = np.random.RandomState(7)
    lines = []
    for v in range(num_videos):
        d = os.path.join(root, f"vid{v:03d}")
        os.makedirs(d, exist_ok=True)
        # smooth content: JPEG decodes fast-ish and realistically
        base = rng.randint(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8
        )
        for f in range(1, num_frames + 1):
            jitter = (img.astype(np.int16) + (f % 5)) % 256
            Image.fromarray(jitter.astype(np.uint8)).save(
                os.path.join(d, TMPL.format(f)), quality=quality
            )
        lines.append(f"vid{v:03d} {num_frames} {v % 4}")
    list_file = os.path.join(root, "val.txt")
    with open(list_file, "w") as fh:
        fh.write("\n".join(lines))
    return list_file


def build_datasets(root, list_file, frames, two_clips):
    from rubiksnet_tpu.data import (
        Compose, GroupCenterCrop, GroupFullResSample, GroupNormalize,
        GroupScale, NativeEvalDataset, RubiksDataset, Stack, ToClipArray,
        native_loader,
    )
    from rubiksnet_tpu.models import INPUT_MEAN, INPUT_STD

    crop_size, scale_size = 224, 256
    if two_clips:
        cropping = Compose(
            [GroupFullResSample(crop_size, scale_size, flip=False)]
        )
    else:
        cropping = Compose([GroupScale(scale_size), GroupCenterCrop(crop_size)])
    transform = Compose(
        [cropping, Stack(roll=False), ToClipArray(div=True),
         GroupNormalize(INPUT_MEAN, INPUT_STD)]
    )

    def make(native):
        ds = RubiksDataset(
            root, list_file, num_segments=frames, new_length=1,
            image_tmpl=TMPL, test_mode=True, remove_missing=True,
            transform=None if native else transform,
            dense_sample=False, twice_sample=two_clips,
        )
        if native:
            ds = NativeEvalDataset(
                ds, scale_size, crop_size, INPUT_MEAN, INPUT_STD,
                two_clips=two_clips,
            )
        return ds

    out = {"pil": make(False)}
    if native_loader.available():
        out["native"] = make(True)
    return out


def time_pass(ds, repeats=2):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        n = 0
        for clip, _label in ds:
            np.asarray(clip).sum()  # force materialization
            n += 1
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=24)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--out", default="DATA_PIPELINE.json")
    args = p.parse_args()

    result = {"videos": args.videos, "frames_per_clip": args.frames,
              "frame_px": "427x240 jpeg q95", "host_cores": os.cpu_count(),
              "protocols": {}}
    with tempfile.TemporaryDirectory() as root:
        list_file = make_frames(root, args.videos, 2 * args.frames)
        for two_clips in (False, True):
            name = "2clip_3crop" if two_clips else "1clip"
            views = 6 if two_clips else 1
            dss = build_datasets(root, list_file, args.frames, two_clips)
            entry = {"views_per_video": views}
            for kind, ds in dss.items():
                sec = time_pass(ds, args.repeats)
                entry[kind] = {
                    "sec_per_video": round(sec, 5),
                    "videos_per_sec": round(1.0 / sec, 2),
                    "clips_per_sec": round(views / sec, 2),
                }
                print(f"{name} {kind}: {sec*1e3:.1f} ms/video "
                      f"({views/sec:.1f} clips/s)", flush=True)
            if "native" in entry and "pil" in entry:
                entry["native_speedup"] = round(
                    entry["pil"]["sec_per_video"]
                    / entry["native"]["sec_per_video"], 2)
            result["protocols"][name] = entry

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result["protocols"].items()}))


if __name__ == "__main__":
    main()

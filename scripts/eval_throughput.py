"""End-to-end evaluator throughput artifact (EVAL_THROUGHPUT.json).

The device-only bench (bench.py) and the host-only pipeline bench
(DATA_PIPELINE.json) each measure half the system; this measures what a user
of scripts/test_models.py actually gets: jpeg decode -> transform -> prefetch
-> jitted sharded eval step, wall-clock videos/s with the host-wait vs
device split (VERDICT r3 #6; reference end-to-end figure:
/root/reference/scripts/eval_logs/ssv2_large_2clip.log:24, 0.024 s/video).

Generates a synthetic SSv2-like frame-folder validation set (340x256 jpegs),
saves a random-init checkpoint of --tier, and runs the REAL evaluator
(scripts/test_models.py, imported main) with the native loader + prefetch +
fused backend, once 1-clip and once 2-clip.

Usage: python scripts/eval_throughput.py [--videos 96] [--out ...]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TMPL = "{:05d}.jpg"


def generate_frames(root, videos, frames_per_video, num_classes, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    lines = []
    t0 = time.time()
    for vi in range(videos):
        d = os.path.join(root, f"vid{vi:05d}")
        os.makedirs(d, exist_ok=True)
        # Smooth low-frequency content: jpeg-encodes fast and decodes like
        # natural video (flat noise would inflate decode cost unrealistically)
        base = rng.randint(0, 200, (8, 11, 3)).astype(np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((340, 256), Image.BILINEAR)
        )
        for f in range(1, frames_per_video + 1):
            jitter = rng.randint(-10, 10, (1, 1, 3))
            frame = np.clip(img.astype(np.int16) + jitter, 0, 255)
            Image.fromarray(frame.astype(np.uint8)).save(
                os.path.join(d, TMPL.format(f)), quality=87
            )
        lines.append(f"vid{vi:05d} {frames_per_video} {vi % num_classes}")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="EVAL_THROUGHPUT.json")
    p.add_argument("--tier", default="large")
    p.add_argument("--videos", type=int, default=96)
    p.add_argument("--frames-per-video", type=int, default=16)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--num-classes", type=int, default=174)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--keep", action="store_true",
                   help="keep the generated frame root")
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()

    work = tempfile.mkdtemp(prefix="rubiks_eval_tp_")
    try:
        gen_s = generate_frames(
            work, args.videos, args.frames_per_video, args.num_classes
        )
        print(f"=> generated {args.videos} videos x "
              f"{args.frames_per_video} frames in {gen_s:.1f}s")

        from rubiksnet_tpu.models import create_rubiksnet
        from rubiksnet_tpu.models.pretrained import save_checkpoint

        # 224 to match the evaluator's hard-coded crop (and the reference's
        # eval resolution) — the artifact must measure the real config.
        bundle = create_rubiksnet(
            args.tier, num_classes=args.num_classes, num_frames=args.frames,
            input_size=224, shift_max_shift=1,
        )
        ckpt = os.path.join(work, "model.msgpack")
        save_checkpoint(bundle, ckpt)

        import test_models

        results = {}
        for mode in ("1clip", "2clip"):
            stats_path = os.path.join(work, f"stats_{mode}.json")
            argv = [
                "test_models.py", "-p", ckpt,
                "--val-list", os.path.join(work, "val.txt"),
                "--root-path", work, "--image-tmpl", TMPL,
                "--num-classes", str(args.num_classes),
                "--frames", str(args.frames),
                "--batch-size", str(args.batch_size),
                "--dtype", "bfloat16", "--loader", "native",
                "--backend", "fused", "--stats-out", stats_path,
            ] + (["--two-clips"] if mode == "2clip" else [])
            old = sys.argv
            sys.argv = argv
            try:
                test_models.main()
            finally:
                sys.argv = old
            with open(stats_path) as f:
                results[mode] = json.load(f)

        out = {
            "synthetic_set": {
                "videos": args.videos,
                "frames_per_video": args.frames_per_video,
                "resolution": "340x256 jpeg q87",
            },
            "tier": args.tier,
            "modes": results,
            "reference_end_to_end": {
                "2clip_sec_per_video": 0.024,
                "source": "scripts/eval_logs/ssv2_large_2clip.log:24",
            },
            "timestamp": time.time(),
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps({
            "out": args.out,
            "videos_per_s_1clip": results["1clip"]["videos_per_s"],
            "videos_per_s_2clip": results["2clip"]["videos_per_s"],
        }))
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

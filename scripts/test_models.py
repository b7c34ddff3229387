"""Full validation-set evaluator.

Mirrors scripts/test_models.py of the reference: 1-clip (center crop) or
2-clip (twice_sample x 3 full-res crops = 6 views) protocols, multi-view
logit averaging, top-1/top-5 and per-class accuracy. The torch DataParallel
eval loop becomes a jitted step pjit-sharded over the 'data' axis of a device
mesh.

Usage:
  python scripts/test_models.py somethingv2 -p ckpt.pth.tar --root-path /data \
      [--two-clips] [--batch-size 80]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="RubiksNet testing on the full validation set"
    )
    parser.add_argument("dataset", type=str, nargs="?", default=None,
                        help="registry dataset name; omit when giving "
                             "--val-list/--image-tmpl directly")
    parser.add_argument("-p", "--pretrained", type=str, required=True)
    parser.add_argument("--root-path", type=str, default="./")
    parser.add_argument("--val-list", type=str, default=None,
                        help="path to a '<folder> <n_frames> <label>' list "
                             "file (bypasses the dataset registry)")
    parser.add_argument("--image-tmpl", type=str, default="{:05d}.jpg",
                        help="frame filename template (with --val-list)")
    parser.add_argument("--num-classes", type=int, default=None,
                        help="class count (with --val-list)")
    parser.add_argument("--stats-out", type=str, default=None,
                        help="write an end-to-end throughput artifact "
                             "(videos/s, host-wait and device split) to "
                             "this JSON path")
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--two-clips", action="store_true")
    parser.add_argument("--batch-size", type=int, default=80)
    parser.add_argument("--limit", type=int, default=None,
                        help="evaluate only the first N videos")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--loader", default="auto",
                        choices=["auto", "pil", "native"],
                        help="'native' uses the C++ libjpeg pipeline; "
                             "'auto' picks native when built")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="batches decoded ahead on a background thread "
                             "(0 disables)")
    parser.add_argument("--backend", default="fused",
                        choices=["fused", "model"],
                        help="'fused' = multi-block Pallas inference executor")
    parser.add_argument("--host-normalize", action="store_true",
                        help="normalize pixels on the host (pre-round-4 "
                             "behavior). Default with the native loader is "
                             "to ship raw uint8 and normalize inside the "
                             "jitted step: 4x fewer host->device bytes")
    args = parser.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.data import (
        Compose, GroupCenterCrop, GroupFullResSample, GroupNormalize,
        GroupScale, NativeEvalDataset, RubiksDataset, Stack, ToClipArray,
        batch_iterator, native_loader, prefetch, return_dataset,
    )
    from rubiksnet_tpu.models import INPUT_MEAN, INPUT_STD, load_pretrained
    from rubiksnet_tpu.parallel import mesh as pmesh
    from rubiksnet_tpu.train.steps import make_eval_step
    from rubiksnet_tpu.utils import AverageMeter, per_class_accuracy

    if args.val_list:
        assert args.num_classes, "--val-list requires --num-classes"
        num_classes, val_list, root_path, prefix = (
            args.num_classes, args.val_list, args.root_path, args.image_tmpl
        )
        print(f"=> dataset: folder list {val_list}")
    else:
        assert args.dataset, "a registry dataset name or --val-list is needed"
        num_classes, _, val_list, root_path, prefix = return_dataset(
            args.dataset, args.root_path
        )
        print(f"=> dataset: {args.dataset}")
    print(f"=> num_classes: {num_classes}")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = load_pretrained(args.pretrained, dtype=dtype)
    print(f"=> tier: {bundle.model.tier}")
    print(f"=> variant: {bundle.model.variant}")
    crop_size, scale_size = 224, 256

    if args.two_clips:
        twice_sample, test_crops = True, 3
        cropping = Compose([GroupFullResSample(crop_size, scale_size, flip=False)])
    else:
        twice_sample, test_crops = False, 1
        cropping = Compose([GroupScale(scale_size), GroupCenterCrop(crop_size)])
    num_views = test_crops * (2 if twice_sample else 1)
    print(f"=> eval mode: {'2-clip' if args.two_clips else '1-clip'}")

    transform = Compose(
        [
            cropping,
            Stack(roll=False),
            ToClipArray(div=True),
            GroupNormalize(INPUT_MEAN, INPUT_STD),
        ]
    )
    use_native = args.loader in ("native", "auto") and native_loader.available()
    if args.loader == "native" and not use_native:
        print("=> native loader unavailable; falling back to PIL")
    dataset = RubiksDataset(
        root_path,
        val_list,
        num_segments=args.frames,
        new_length=1,
        image_tmpl=prefix,
        test_mode=True,
        remove_missing=True,
        transform=None if use_native else transform,
        dense_sample=False,
        twice_sample=twice_sample,
    )
    if args.limit:
        dataset.video_list = dataset.video_list[: args.limit]
    device_norm = use_native and not args.host_normalize
    if use_native:
        print("=> loader: native (C++ libjpeg pipeline)")
        dataset = NativeEvalDataset(
            dataset, scale_size, crop_size, INPUT_MEAN, INPUT_STD,
            two_clips=args.two_clips,
            out_dtype="uint8" if device_norm else "float32",
        )
    if device_norm:
        print("=> input: raw uint8, normalized on device")
    print(f"=> videos: {len(dataset)}")

    m = pmesh.create_mesh()
    eval_step = jax.jit(
        make_eval_step(bundle.model, num_crops=num_views,
                       fused=args.backend == "fused",
                       normalize=(INPUT_MEAN, INPUT_STD) if device_norm
                       else None)
    )
    variables = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.replicated(m)), dict(bundle.variables)
    )

    top1, top5 = AverageMeter(), AverageMeter()
    all_preds, all_labels = [], []
    t0 = time.time()
    host_wait = device_time = 0.0
    first_batch_s = None  # host+device of batch 0 (compile + warmup)
    seen = first_videos = 0
    batches = batch_iterator(dataset, args.batch_size, num_views, args.frames)
    if args.prefetch > 0:
        batches = prefetch(batches, depth=args.prefetch)
    it = enumerate(batches)
    while True:
        th0 = time.time()
        try:
            i, (video, labels, valid) = next(it)
        except StopIteration:
            break
        host_wait += time.time() - th0
        td0 = time.time()
        if not device_norm:
            video = video.astype(np.float32)
        batch = pmesh.shard_batch(m, {"v": video, "l": labels})
        out = eval_step(variables, batch["v"], batch["l"])
        n_valid = int(valid.sum())
        logits = np.asarray(out["logits"])[:n_valid]
        device_time += time.time() - td0
        if first_batch_s is None:
            first_batch_s = time.time() - t0
            first_videos = n_valid
        lab = labels[:n_valid]
        preds = logits.argmax(1)
        all_preds.append(preds)
        all_labels.append(lab)
        top1.update(100.0 * float(np.mean(preds == lab)), n_valid)
        order5 = np.argsort(-logits, axis=1)[:, :5]
        top5.update(100.0 * float(np.mean((order5 == lab[:, None]).any(1))), n_valid)
        seen += n_valid
        if i % 20 == 0:
            dt = time.time() - t0
            print(
                f"video {seen} done, total {seen}/{len(dataset)}, "
                f"average {dt / max(seen, 1):.3f} sec/video "
                f"(host-input wait {host_wait:.1f}s, device step+fetch "
                f"{device_time:.1f}s), "
                f"moving Prec@1 {top1.avg:.3f} Prec@5 {top5.avg:.3f}"
            )

    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    cls_acc = per_class_accuracy(labels, preds, num_classes)

    print("\n====================== Evaluation Complete ======================")
    print("Class accuracy:")
    print(cls_acc)
    print(f"\nAccuracy: top 1: {top1.avg:.02f}%\ttop 5: {top5.avg:.02f}%")

    if args.stats_out:
        import json

        wall = time.time() - t0
        # Steady state: exclude batch 0, which pays trace+compile (or the
        # compile-cache load) — the number a long evaluation converges to.
        steady_videos = seen - first_videos
        steady_wall = wall - (first_batch_s or 0.0)
        stats = {
            "videos": seen,
            "videos_per_s": round(seen / max(wall, 1e-9), 2),
            "sec_per_video": round(wall / max(seen, 1), 4),
            "steady_videos_per_s": round(
                steady_videos / max(steady_wall, 1e-9), 2
            ) if steady_videos > 0 else None,
            "steady_sec_per_video": round(
                steady_wall / steady_videos, 4
            ) if steady_videos > 0 else None,
            "first_batch_s": round(first_batch_s or 0.0, 2),
            "device_normalize": bool(device_norm),
            "wall_s": round(wall, 2),
            "host_wait_s": round(host_wait, 2),
            "host_wait_frac": round(host_wait / max(wall, 1e-9), 3),
            "device_step_fetch_s": round(device_time, 2),
            "device_frac": round(device_time / max(wall, 1e-9), 3),
            "two_clips": bool(args.two_clips),
            "views_per_video": num_views,
            "batch_size": args.batch_size,
            "prefetch": args.prefetch,
            "loader": "native" if use_native else "pil",
            "backend": args.backend,
            "dtype": args.dtype,
            "tier": bundle.model.tier,
            "top1": round(top1.avg, 2),
            "top5": round(top5.avg, 2),
            "device": str(jax.devices()[0]),
        }
        with open(args.stats_out, "w") as f:
            json.dump(stats, f, indent=2)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()

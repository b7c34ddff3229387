"""Finetuning example on a synthetic label-correlated dataset.

Mirrors scripts/example_finetune.py of the reference: load a pretrained
RubiksNet (or start from random weights with --from-scratch), replace the
classifier head, and train with SGD where shift parameters get a reduced
learning rate. The synthetic dataset encodes the label as mean frame
brightness (example_finetune.py:163-172), so the model should overfit within
a few epochs — this exercises the full custom-VJP gradient path end to end.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def make_dummy_frame(label, num_classes, rng, size=256):
    """example_finetune.py:158-172: brightness encodes the label."""
    dummy_value = label / num_classes
    img = dummy_value + rng.randn(size, size, 3) / num_classes / 10.0
    img = np.clip(img * 255, 0, 255).astype(np.uint8)
    return Image.fromarray(img)


class ExampleVideoDataset:
    def __init__(self, num_classes, num_frames, transform, total_size, seed=0):
        self.num_classes = num_classes
        self.num_frames = num_frames
        self.transform = transform
        self.total_size = total_size
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        for _ in range(self.total_size):
            label = int(self.rng.randint(0, self.num_classes))
            frames = [
                make_dummy_frame(label, self.num_classes, self.rng)
                for _ in range(self.num_frames)
            ]
            yield self.transform(frames), label


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-classes", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lr-shift-mult", type=float, default=0.1)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight-decay", type=float, default=1e-4)
    parser.add_argument("--total-epochs", type=int, default=100)
    parser.add_argument("--pretrained-path", type=str, default=None)
    parser.add_argument("--tier", type=str, default="tiny")
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--train-size", type=int, default=32 * 50)
    parser.add_argument("--test-size", type=int, default=32 * 10)
    parser.add_argument("--input-size", type=int, default=224)
    args = parser.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.data import (
        Compose, GroupMultiScaleCrop, GroupRandomCrop,
        GroupRandomHorizontalFlip, Stack, ToClipArray,
    )
    from rubiksnet_tpu.models import create_rubiksnet, load_pretrained
    from rubiksnet_tpu.train import (
        create_train_state, make_eval_step, make_train_step, sgd_with_shift_mult,
    )

    if args.pretrained_path:
        bundle = load_pretrained(args.pretrained_path)
        bundle = bundle.replace_new_fc(args.num_classes)
    else:
        print("=> no pretrained checkpoint given; training from random init")
        bundle = create_rubiksnet(
            args.tier, args.num_classes, args.frames, input_size=64,
            shift_backend="conv", remat=True,
        )

    # train transforms per example_finetune.py:76-83 (note: no normalization)
    transform = Compose(
        [
            GroupMultiScaleCrop(256, [1, 0.875, 0.75, 0.66]),
            GroupRandomHorizontalFlip(),
            GroupRandomCrop(args.input_size),
            Stack(),
            ToClipArray(div=True),
        ]
    )

    tx = sgd_with_shift_mult(
        args.lr, args.lr_shift_mult, args.momentum, args.weight_decay
    )
    state = create_train_state(bundle, tx)
    train_step = jax.jit(make_train_step(bundle.model, tx))
    eval_step = jax.jit(make_eval_step(bundle.model, num_crops=1))

    def batches(ds):
        vids, labs = [], []
        for clip, label in ds:
            vids.append(np.asarray(clip, np.float32))
            labs.append(label)
            if len(vids) == args.batch_size:
                yield np.stack(vids), np.asarray(labs, np.int32)
                vids, labs = [], []

    for epoch in range(args.total_epochs):
        print(f"\nNew epoch: {epoch}")
        train_ds = ExampleVideoDataset(
            args.num_classes, args.frames, transform, args.train_size, seed=epoch
        )
        run_loss, correct, total = 0.0, 0, 0
        for bidx, (video, labels) in enumerate(batches(train_ds)):
            state, metrics = train_step(state, jnp.asarray(video), jnp.asarray(labels))
            run_loss += float(metrics["loss"])
            correct += int(float(metrics["accuracy"]) * len(labels))
            total += len(labels)
            print(
                f"Epoch: {epoch + 1}/{args.total_epochs} | Batch: {bidx + 1} | "
                f"Loss: {run_loss / (bidx + 1):.3f} | "
                f"Acc: {100.0 * correct / total:.2f}% ({correct}/{total})"
            )

        print("Testing ...")
        test_ds = ExampleVideoDataset(
            args.num_classes, args.frames, transform, args.test_size, seed=10_000
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        correct, total = 0, 0
        for video, labels in batches(test_ds):
            out = eval_step(variables, jnp.asarray(video)[:, None], jnp.asarray(labels))
            correct += int(np.sum(np.asarray(out["top1"])))
            total += len(labels)
        print(f"\nFinal Acc for epoch {epoch}: {100.0 * correct / total:.2f}% "
              f"({correct}/{total})")


if __name__ == "__main__":
    main()

"""Production training CLI: dataset -> prefetch -> sharded train step ->
checkpoint/resume -> metrics.

The reference ships only a toy finetuning example
(/root/reference/scripts/example_finetune.py); this is the full training
entry the framework provides around the same step semantics (SGD with
reduced shift LR, BN batch stats, the custom normalized shift-gradient VJP):

  * registry datasets (data/config.py) or --synthetic for a data-free run,
  * background-thread input prefetch overlapping host decode with device
    compute,
  * SPMD over a (data x model) jax.sharding.Mesh (replaces the reference's
    nn.DataParallel, scripts/test_models.py:153) — sharded batches, TP of
    the widest kernels, XLA-inserted collectives,
  * cosine/constant LR schedule with warmup (per-group multipliers apply on
    top, backbone.py:202-235 policy),
  * full TrainState checkpointing (params + BN stats + optimizer + step)
    with atomic saves and bit-identical resume (train/checkpoint.py),
  * periodic validation with top-1/top-5 and a throughput meter.

Examples:
  python scripts/train.py --synthetic 512 --tier tiny --input-size 64 \
      --batch-size 8 --steps 50 --checkpoint-dir /tmp/run1
  python scripts/train.py somethingv2 --root /data/ssv2 --tier large \
      --pretrained ckpts/rubiks3d_large.pth.tar --batch-size 64 --epochs 5
"""

import argparse
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("dataset", nargs="?", default=None,
                   help="registry dataset name (data/config.py); omit with "
                        "--synthetic")
    p.add_argument("--root", default=None, help="dataset root path")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="train on N label-correlated synthetic clips per "
                        "epoch instead of a registry dataset")
    p.add_argument("--tier", default="large",
                   choices=["tiny", "small", "medium", "large"])
    p.add_argument("--variant", default="rubiks3d",
                   choices=["rubiks3d", "rubiks3d-aq"])
    p.add_argument("--pretrained", default=None,
                   help=".pth.tar or native checkpoint to start from "
                        "(classifier head is replaced)")
    p.add_argument("--num-classes", type=int, default=10,
                   help="class count (synthetic mode; registry datasets "
                        "override)")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps", type=int, default=0,
                   help="stop after this many optimizer steps (0 = run the "
                        "full --epochs)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--total-steps", type=int, default=0,
                   help="cosine horizon (defaults to --steps or "
                        "epochs * len(dataset) / batch)")
    p.add_argument("--lr-shift-mult", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--data-parallel", type=int, default=0, metavar="D",
                   help="mesh data-axis size (0 = all devices / model)")
    p.add_argument("--model-parallel", type=int, default=1, metavar="M",
                   help="mesh model-axis (tensor-parallel) size")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--save-every", type=int, default=500, metavar="STEPS")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in "
                        "--checkpoint-dir")
    p.add_argument("--val-every", type=int, default=0, metavar="STEPS",
                   help="run validation every N steps (0 = each epoch end)")
    p.add_argument("--val-size", type=int, default=0,
                   help="cap validation to this many clips (0 = all)")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--prefetch-depth", type=int, default=2)
    p.add_argument("--shift-backend", default="auto")
    p.add_argument("--scan-blocks", default="auto",
                   choices=["auto", "on", "off"],
                   help="run each stage's repeated blocks under one lax.scan "
                        "with stacked params (auto = on: ~6x smaller "
                        "serialized train graph, identical numerics — "
                        "tests/test_scan_blocks.py). Checkpoints written by "
                        "a scanned run store the scanned layout and record "
                        "it in metadata; resume with the same setting. Final "
                        "weights export canonical either way via "
                        "models/scan_convert.py")
    p.add_argument("--no-remat", action="store_true",
                   help="disable rematerialization (NOT safe on the v5e "
                        "runtime for multi-block models; see CLAUDE.md)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def synthetic_batches(n_clips, num_classes, frames, size, batch, seed):
    """Label-correlated random clips, generated directly as arrays (the
    brightness-encodes-label scheme of example_finetune.py:163-172 without
    the PIL round-trip)."""
    rng = np.random.RandomState(seed)
    steps = n_clips // batch
    for _ in range(steps):
        labels = rng.randint(0, num_classes, size=(batch,)).astype(np.int32)
        base = labels.astype(np.float32) / num_classes
        noise = rng.randn(batch, frames, size, size, 3).astype(np.float32)
        video = base[:, None, None, None, None] + noise / num_classes / 10.0
        yield np.clip(video, 0.0, 1.0), labels


def checkpoint_path(ckpt_dir, step):
    return os.path.join(ckpt_dir, f"train_state_{step:08d}.msgpack")


def latest_checkpoint(ckpt_dir):
    paths = glob.glob(os.path.join(ckpt_dir, "train_state_*.msgpack"))
    best = None
    for path in paths:
        m = re.search(r"train_state_(\d+)\.msgpack$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    return best[1] if best else None


def main():
    args = build_args()
    if not args.synthetic and not args.dataset:
        raise SystemExit("either a registry dataset name or --synthetic N "
                         "is required")

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rubiksnet_tpu.data import (
        Compose, GroupMultiScaleCrop, GroupRandomCrop,
        GroupRandomHorizontalFlip, GroupScale, GroupCenterCrop, Stack,
        ToClipArray,
    )
    from rubiksnet_tpu.data.config import return_dataset
    from rubiksnet_tpu.data.dataset import RubiksDataset, batch_iterator
    from rubiksnet_tpu.data.prefetch import prefetch
    from rubiksnet_tpu.models import create_rubiksnet, load_pretrained
    from rubiksnet_tpu.parallel import mesh as pmesh
    from rubiksnet_tpu.train import (
        create_train_state, load_train_state, make_eval_step,
        make_train_step, save_train_state, sgd_with_shift_mult,
    )
    from rubiksnet_tpu.utils.metrics import AverageMeter

    # ---- data -----------------------------------------------------------
    if args.synthetic:
        num_classes = args.num_classes
        steps_per_epoch = max(args.synthetic // args.batch_size, 1)

        def train_epoch_iter(epoch):
            return synthetic_batches(
                args.synthetic, num_classes, args.frames, args.input_size,
                args.batch_size, seed=args.seed + epoch,
            )

        def val_iter():
            for video, labels in synthetic_batches(
                max(args.val_size, args.batch_size), num_classes,
                args.frames, args.input_size, args.batch_size,
                seed=args.seed + 10_000,
            ):
                yield video, labels, np.ones((len(labels),), np.float32)
    else:
        num_classes, train_list, val_list, root, tmpl = return_dataset(
            args.dataset, args.root or "."
        )
        train_tf = Compose([
            GroupMultiScaleCrop(256, [1, 0.875, 0.75, 0.66]),
            GroupRandomHorizontalFlip(),
            GroupRandomCrop(args.input_size),
            Stack(),
            ToClipArray(div=True),
        ])
        val_tf = Compose([
            GroupScale(int(args.input_size * 256 / 224)),
            GroupCenterCrop(args.input_size),
            Stack(),
            ToClipArray(div=True),
        ])
        train_ds = RubiksDataset(
            root, train_list, num_segments=args.frames, image_tmpl=tmpl,
            transform=train_tf, random_shift=True, seed=args.seed,
        )
        val_ds = RubiksDataset(
            root, val_list, num_segments=args.frames, image_tmpl=tmpl,
            transform=val_tf, random_shift=False,
        )
        steps_per_epoch = max(len(train_ds) // args.batch_size, 1)

        def train_epoch_iter(epoch):
            for video, labels, _ in batch_iterator(
                train_ds, args.batch_size, num_crops=1,
                num_frames=args.frames, drop_remainder=True,
            ):
                yield video[:, 0], labels

        def val_iter():
            count = 0
            for video, labels, valid in batch_iterator(
                val_ds, args.batch_size, num_crops=1,
                num_frames=args.frames,
            ):
                yield video[:, 0], labels, valid
                count += int(valid.sum())
                if args.val_size and count >= args.val_size:
                    return

    # ---- model / optimizer ---------------------------------------------
    scan_blocks = args.scan_blocks in ("auto", "on")
    if args.pretrained:
        bundle = load_pretrained(args.pretrained)
        bundle = bundle.replace_new_fc(num_classes)
        if scan_blocks:
            bundle = bundle.to_scanned()
    else:
        bundle = create_rubiksnet(
            args.tier, num_classes, args.frames, variant=args.variant,
            input_size=args.input_size, shift_backend=args.shift_backend,
            remat=not args.no_remat, scan_blocks=scan_blocks,
        )

    total_steps = args.total_steps or args.steps or (
        args.epochs * steps_per_epoch
    )
    if args.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if args.warmup_steps else args.lr,
            peak_value=args.lr,
            warmup_steps=args.warmup_steps,
            decay_steps=max(total_steps, args.warmup_steps + 1),
        )
    elif args.warmup_steps:
        lr = optax.linear_schedule(0.0, args.lr, args.warmup_steps)
    else:
        lr = args.lr
    tx = sgd_with_shift_mult(
        lr, args.lr_shift_mult, args.momentum, args.weight_decay
    )
    state = create_train_state(bundle, tx)

    start_step = 0
    if args.resume:
        assert args.checkpoint_dir, "--resume requires --checkpoint-dir"
        path = latest_checkpoint(args.checkpoint_dir)
        if path:
            state, meta = load_train_state(path, state)
            start_step = int(state.step)
            print(f"=> resumed {path} (step {start_step}, meta {meta})")
        else:
            print("=> --resume: no checkpoint found, starting fresh")

    # ---- mesh / sharding ------------------------------------------------
    n_dev = len(jax.devices())
    mp = args.model_parallel
    dp = args.data_parallel or n_dev // mp
    mesh = pmesh.create_mesh(data=dp, model=mp,
                             devices=jax.devices()[: dp * mp])
    print(f"devices: {n_dev} | mesh: data={dp} x model={mp} | "
          f"tier={args.tier} variant={args.variant} "
          f"classes={num_classes} bs={args.batch_size}")
    assert args.batch_size % dp == 0, (args.batch_size, dp)

    pspecs = pmesh.param_partition_spec(state.params)
    put = lambda t, s: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, s)), t
    )
    state = state._replace(
        params=jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state.params, pspecs,
        ),
        batch_stats=put(state.batch_stats, P()),
        opt_state=put(state.opt_state, P()),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )
    batch_sh = NamedSharding(mesh, P(pmesh.DATA_AXIS))

    train_step = jax.jit(make_train_step(bundle.model, tx))
    eval_step = jax.jit(make_eval_step(bundle.model, num_crops=1))

    def run_validation(step):
        loss_m, top1_m, top5_m = AverageMeter(), AverageMeter(), AverageMeter()
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        for video, labels, valid in val_iter():
            out = eval_step(
                variables,
                jax.device_put(jnp.asarray(video)[:, None], batch_sh),
                jax.device_put(jnp.asarray(labels), batch_sh),
            )
            v = np.asarray(valid)
            n = max(int(v.sum()), 1)
            top1_m.update(float(np.sum(np.asarray(out["top1"]) * v)) / n, n)
            top5_m.update(float(np.sum(np.asarray(out["top5"]) * v)) / n, n)
        print(f"[val @ step {step}] top1 {top1_m.avg * 100:.2f}% "
              f"top5 {top5_m.avg * 100:.2f}% ({top1_m.count} clips)")

    def maybe_save(step, epoch):
        if args.checkpoint_dir:
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            save_train_state(
                checkpoint_path(args.checkpoint_dir, step), state,
                metadata={"tier": args.tier, "variant": args.variant,
                          "num_classes": num_classes, "epoch": epoch,
                          "frames": args.frames,
                          "input_size": args.input_size,
                          "scan_blocks": scan_blocks},
            )
            print(f"=> saved checkpoint @ step {step}")

    # ---- train loop -----------------------------------------------------
    step = start_step
    done = False
    for epoch in range(args.epochs):
        if done:
            break
        loss_m, acc_m = AverageMeter(), AverageMeter()
        t_last, c_last = time.time(), 0
        for video, labels in prefetch(train_epoch_iter(epoch),
                                      depth=args.prefetch_depth):
            state, metrics = train_step(
                state,
                jax.device_put(jnp.asarray(video), batch_sh),
                jax.device_put(jnp.asarray(labels), batch_sh),
            )
            step += 1
            loss_m.update(float(metrics["loss"]), len(labels))
            acc_m.update(float(metrics["accuracy"]), len(labels))
            c_last += len(labels)
            if step % args.log_every == 0:
                dt = time.time() - t_last
                print(f"epoch {epoch + 1}/{args.epochs} step {step} | "
                      f"loss {loss_m.avg:.4f} acc {acc_m.avg * 100:.2f}% | "
                      f"{c_last / max(dt, 1e-9):.1f} clips/s", flush=True)
                t_last, c_last = time.time(), 0
            if args.save_every and step % args.save_every == 0:
                maybe_save(step, epoch)
            if args.val_every and step % args.val_every == 0:
                run_validation(step)
            if args.steps and step - start_step >= args.steps:
                done = True
                break
        if not args.val_every:
            run_validation(step)
    maybe_save(step, args.epochs - 1)
    if args.checkpoint_dir:
        # Final model weights in the CANONICAL per-block layout (what
        # load_pretrained / the fused inference executor consume), whatever
        # layout training ran in.
        from rubiksnet_tpu.models.pretrained import save_checkpoint

        final = type(bundle)(
            model=bundle.model,
            variables={"params": jax.device_get(state.params),
                       "batch_stats": jax.device_get(state.batch_stats)},
        )
        if scan_blocks:
            final = final.to_unrolled()
        final_path = os.path.join(args.checkpoint_dir, "model_final.msgpack")
        save_checkpoint(final, final_path)
        print(f"=> saved final canonical weights to {final_path}")
    print(f"done: {step - start_step} steps this run "
          f"(global step {step}), final loss {loss_m.avg:.4f}")


if __name__ == "__main__":
    main()

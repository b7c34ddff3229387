"""On-TPU training correctness + speed artifact (BASELINE config #5).

Runs the full train step (custom-VJP normalized shift gradients, BN stats,
shift-lr optimizer groups, remat) ON THE CHIP and overfits a synthetic
label-as-brightness batch — the reference's de-facto end-to-end gradient
check (/root/reference/scripts/example_finetune.py:158-172,
README.md:104-106) — recording loss trajectory and per-step wall time to
TRAIN_TPU_OK.json.

Usage: python scripts/train_tpu_check.py [--tier tiny] [--steps 40]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="tiny")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--scan-blocks", action="store_true",
                   help="scanned-stage layout (lax.scan over repeated "
                        "blocks): the ~6x smaller serialized train graph "
                        "that fits Large through the tunnel's request cap")
    p.add_argument("--out", default="TRAIN_TPU_OK.json")
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.train import (
        create_train_state, make_train_step, sgd_with_shift_mult,
    )

    bundle = create_rubiksnet(
        args.tier, num_classes=args.num_classes, num_frames=args.frames,
        input_size=args.size, remat=True, scan_blocks=args.scan_blocks,
    )
    tx = sgd_with_shift_mult(lr=0.05, lr_shift_mult=0.1)
    state = jax.device_put(create_train_state(bundle, tx), jax.devices()[0])
    step = jax.jit(make_train_step(bundle.model, tx))

    rng = np.random.RandomState(0)
    labels_np = np.arange(args.batch) % args.num_classes
    video = jax.device_put(jnp.asarray(
        labels_np[:, None, None, None, None] / args.num_classes
        + 0.1 * rng.randn(args.batch, args.frames, args.size, args.size, 3),
        jnp.float32,
    ), jax.devices()[0])
    labels = jax.device_put(
        jnp.asarray(labels_np, jnp.int32), jax.devices()[0]
    )

    losses, shift0 = [], None
    t_compile = time.time()
    state, metrics = step(state, video, labels)
    jax.block_until_ready(metrics["loss"])
    t_compile = time.time() - t_compile
    losses.append(float(metrics["loss"]))
    t0 = time.time()
    for _ in range(args.steps - 1):
        state, metrics = step(state, video, labels)
        losses.append(float(metrics["loss"]))  # fetch syncs each step
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / max(1, args.steps - 1)

    # shift params must actually move (the custom-VJP path is live)
    p0 = bundle.variables["params"]
    moved = float(jnp.max(jnp.abs(
        state.params["backbone"]["layer1_0"]["as3"]["rubiks3d"]["shift"]
        - p0["backbone"]["layer1_0"]["as3"]["rubiks3d"]["shift"])))

    dev = str(jax.devices()[0])
    out = {
        "device": dev,
        "on_tpu": jax.default_backend() == "tpu",
        "tier": args.tier,
        "scan_blocks": bool(args.scan_blocks),
        "batch": args.batch,
        "frames": args.frames,
        "size": args.size,
        "steps": args.steps,
        "first_loss": losses[0],
        "last_loss": losses[-1],
        "final_accuracy": float(metrics["accuracy"]),
        "loss_decreased": losses[-1] < 0.5 * losses[0],
        "max_shift_param_delta": moved,
        "compile_plus_first_step_s": round(t_compile, 2),
        "sec_per_step_with_fetch": round(dt, 4),
        "losses_every_5": [round(l, 4) for l in losses[::5]],
    }
    ok = (out["loss_decreased"] and np.isfinite(losses[-1]) and moved > 0
          and out["final_accuracy"] >= 0.75)
    out["ok"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"ok": out["ok"], "first": losses[0],
                      "last": losses[-1], "acc": out["final_accuracy"],
                      "device": dev}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Export a RubiksNet checkpoint as a self-contained serving artifact.

Traces + lowers the multi-view eval forward with jax.export and writes one
file that a serving host can run without any model code (see
rubiksnet_tpu/serving/export.py). With --check, the artifact is re-loaded
and its logits verified against the live model.

Examples:
  python scripts/export_model.py --checkpoint ckpts/rubiks3d_large.pth.tar \
      --batch-size 64 --crops 6 --out large_2clip.jaxexport
  python scripts/export_model.py --tier tiny --batch-size 4 \
      --input-size 64 --out tiny.jaxexport --check
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help=".pth.tar or native checkpoint (default: random "
                        "weights of --tier)")
    p.add_argument("--tier", default="large")
    p.add_argument("--variant", default="rubiks3d")
    p.add_argument("--num-classes", type=int, default=174)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--crops", type=int, default=1,
                   help="views per clip averaged inside the artifact "
                        "(2-clip x 3-crop protocol = 6)")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas executor (TPU-only artifact)")
    p.add_argument("--polymorphic-batch", action="store_true")
    p.add_argument("--out", required=True)
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify logits match the "
                        "live model")
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet, load_pretrained
    from rubiksnet_tpu.serving import (
        export_eval_fn, load_exported, run_exported, save_exported,
    )

    if args.checkpoint:
        bundle = load_pretrained(args.checkpoint)
    else:
        bundle = create_rubiksnet(
            args.tier, args.num_classes, args.frames, variant=args.variant,
            input_size=args.input_size,
        )

    exported = export_eval_fn(
        bundle, args.batch_size, num_crops=args.crops,
        input_size=args.input_size, fused=args.fused,
        polymorphic_batch=args.polymorphic_batch,
    )
    save_exported(args.out, exported)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"platforms={exported.platforms})")

    if args.check:
        video = np.random.RandomState(0).randn(
            args.batch_size, args.crops, args.frames, args.input_size,
            args.input_size, 3,
        ).astype(np.float32)
        got = np.asarray(run_exported(load_exported(args.out),
                                      jnp.asarray(video)))
        flat = video.reshape((-1,) + video.shape[2:])
        want = bundle(jnp.asarray(flat), train=False)
        want = np.asarray(want).reshape(
            args.batch_size, args.crops, -1).mean(axis=1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        print("check OK: artifact logits match the live model")


if __name__ == "__main__":
    main()

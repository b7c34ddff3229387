"""Benchmark: RubiksNet-Large 8-frame inference throughput (clips/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

Baseline: the reference eval logs report 0.008 s/video for Large 1-clip
(scripts/eval_logs/ssv2_large_1clip.log:24, see BASELINE.md) = 125 clips/s on
an unspecified CUDA-10.1-era GPU.
"""

import argparse
import json
import time

import numpy as np


BASELINE_CLIPS_PER_SEC = 125.0  # 0.008 s/video, ssv2_large_1clip.log:24


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="large")
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[32, 64])
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--backend", default="conv",
                   choices=["pallas", "conv", "select", "gather"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = create_rubiksnet(
        args.tier, num_classes=174, num_frames=args.frames, input_size=64,
        dtype=dtype, shift_backend=args.backend,
    )

    from rubiksnet_tpu.utils.benchmark import time_chained

    device = jax.devices()[0]
    variables = jax.device_put(bundle.variables, device)

    def forward(video):
        return bundle.model.apply(variables, video, train=False)

    best = 0.0
    best_bs = None
    results = {}
    for bs in args.batch_sizes:
        video = jax.device_put(
            jnp.asarray(
                np.random.RandomState(0).randn(
                    bs, args.frames, args.size, args.size, 3
                ),
                dtype,
            ),
            device,
        )
        dt = time_chained(forward, video, n_lo=args.warmup, n_hi=args.iters)
        clips_per_sec = bs / dt
        results[bs] = clips_per_sec
        if clips_per_sec > best:
            best, best_bs = clips_per_sec, bs

    print(
        json.dumps(
            {
                "metric": f"clips/sec/chip RubiksNet-{args.tier.capitalize()} "
                f"{args.frames}-frame {args.size}px {args.dtype} "
                f"{args.backend}-backend inference",
                "value": round(best, 2),
                "unit": "clips/s",
                "vs_baseline": round(best / BASELINE_CLIPS_PER_SEC, 3),
                "detail": {
                    "batch_sweep": {str(k): round(v, 2) for k, v in results.items()},
                    "best_batch": best_bs,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

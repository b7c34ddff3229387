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
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[64])
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--backend", default="conv",
                   choices=["pallas", "conv", "select", "gather"])
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--mode", default="infer", choices=["infer", "train"])
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = create_rubiksnet(
        args.tier, num_classes=174, num_frames=args.frames, input_size=64,
        dtype=dtype, shift_backend=args.backend, remat=args.mode == "train",
    )

    from rubiksnet_tpu.utils.benchmark import time_chained

    device = jax.devices()[0]
    variables = jax.device_put(bundle.variables, device)

    if args.mode == "train":
        from rubiksnet_tpu.train import (
            create_train_state, make_train_step, sgd_with_shift_mult,
        )
        import time as _time
        from jax import lax

        tx = sgd_with_shift_mult(1e-3, 0.1)
        state0 = jax.device_put(create_train_state(bundle, tx), device)
        step = make_train_step(bundle.model, tx)
        results = {}
        best, best_bs = 0.0, None
        for bs in args.batch_sizes:
            video = jax.device_put(
                jnp.asarray(
                    np.random.RandomState(0).randn(
                        bs, args.frames, args.size, args.size, 3
                    ),
                    jnp.float32,
                ),
                device,
            )
            labels = jax.device_put(
                jnp.asarray(np.arange(bs) % 174, jnp.int32), device
            )

            def chained(n):
                return jax.jit(
                    lambda s: lax.fori_loop(
                        0, n, lambda i, st: step(st, video, labels)[0], s
                    )
                )

            f_lo, f_hi = chained(args.warmup), chained(args.iters)

            def run(f):
                st = f(state0)
                _ = np.asarray(jax.tree_util.tree_leaves(st.params)[0]).ravel()[0]

            run(f_lo); run(f_hi)
            t0 = _time.perf_counter(); run(f_lo); t_lo = _time.perf_counter() - t0
            t0 = _time.perf_counter(); run(f_hi); t_hi = _time.perf_counter() - t0
            dt = (t_hi - t_lo) / (args.iters - args.warmup)
            results[bs] = bs / dt
            if results[bs] > best:
                best, best_bs = results[bs], bs
        print(
            json.dumps(
                {
                    "metric": f"train clips/sec/chip RubiksNet-{args.tier.capitalize()} "
                    f"{args.frames}-frame {args.size}px {args.backend}-backend",
                    "value": round(best, 2),
                    "unit": "clips/s",
                    "vs_baseline": None,
                    "detail": {
                        "batch_sweep": {str(k): round(v, 2) for k, v in results.items()},
                        "best_batch": best_bs,
                    },
                }
            )
        )
        return

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
        try:
            dt = time_chained(
                forward, video, n_lo=args.warmup, n_hi=args.iters, repeats=3
            )
        except RuntimeError as e:
            print(f"warning: {e}", flush=True)
            continue
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

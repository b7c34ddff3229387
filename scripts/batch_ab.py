"""Interleaved batch-size A/B: is the bs32/96-vs-64 cliff real or drift?

BENCH_r04 recorded 631.6 clips/s at bs64 but ~410 at bs32/96 — a 1.5x
per-clip swing between adjacent batch sizes of the SAME fused executor. The
bench's per-batch child processes run sequentially, so each batch point is
captured in a different chip phase of a runtime whose delivered wall clock
drifts up to 4x on a minutes timescale (docs/PERF_NOTES.md). This study
times all batch sizes round-robin in ONE process (scripts/model_ab.py
methodology: compile everything up front, seeded per-round shuffle, per-round
per-clip ratios vs bs --base so the phase multiplier divides out) and writes
BATCH_AB.json: if the per-round ratios sit near 1.0 the cliff is a
measurement artifact of sequential capture; a real geometry effect (VMEM
grouping, XLA layout choice at that batch) survives interleaving.

Usage: python scripts/batch_ab.py [--batches 32,64,96,128] [--rounds 5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="BATCH_AB.json")
    p.add_argument("--batches", default="32,64,96,128")
    p.add_argument("--base", type=int, default=64,
                   help="ratio denominator batch size")
    p.add_argument("--tier", default="large")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--rounds", type=int, default=5)
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.models.fused_infer import (
        fused_infer_apply, resolved_fused_config,
    )
    from rubiksnet_tpu.utils.benchmark import ChainedTimer

    dtype = jnp.bfloat16
    bundle = create_rubiksnet(
        args.tier, num_classes=174, num_frames=args.frames, input_size=64,
        dtype=dtype, shift_backend="auto", shift_max_shift=1,
    )
    device = jax.devices()[0]
    variables = jax.device_put(bundle.variables, device)

    def forward(v):
        return fused_infer_apply(bundle.model, variables, v)

    batches = [int(b) for b in args.batches.split(",")]
    assert args.base in batches, "base batch must be in --batches"
    timers = {}
    for bs in batches:
        video = jax.device_put(
            jnp.asarray(
                np.random.RandomState(0).randn(
                    bs, args.frames, args.size, args.size, 3
                ),
                dtype,
            ),
            device,
        )
        timers[bs] = ChainedTimer(forward, video, n_lo=1, n_hi=args.iters)
        print(f"compiled bs={bs}", flush=True)

    samples = {bs: [] for bs in batches}  # per-clip us, index = round

    def write_out(rounds_done):
        done = {bs: [s for s in v if s is not None]
                for bs, v in samples.items()}
        done = {bs: v for bs, v in done.items() if v}

        def ratios(bs):
            # per-round per-CLIP time ratio vs base (>1 = slower per clip)
            return [s / b for b, s in zip(samples[args.base], samples[bs])
                    if b is not None and s is not None]

        out = {
            "device": str(jax.devices()[0]),
            "tier": args.tier,
            "rounds": rounds_done,
            "rounds_requested": args.rounds,
            "base_batch": args.base,
            "fused_config": resolved_fused_config(),
            "batches": {
                str(bs): {
                    "us_per_clip": [round(s * 1e6, 1) for s in v],
                    "median_clips_per_s": round(1.0 / float(np.median(v)), 1),
                    "best_clips_per_s": round(1.0 / min(v), 1),
                }
                for bs, v in done.items()
            },
            "median_per_clip_ratio_vs_base": {
                str(bs): round(float(np.median(ratios(bs))), 3)
                for bs in done if bs != args.base and ratios(bs)
            },
            "per_clip_ratio_spread_vs_base": {
                str(bs): [round(r, 3) for r in ratios(bs)]
                for bs in done if bs != args.base
            },
        }
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, args.out)

    for rnd in range(args.rounds):
        order = [batches[i] for i in
                 np.random.RandomState(rnd).permutation(len(batches))]
        for bs in order:
            try:
                dt = timers[bs].sample(repeats=2) / bs  # seconds per clip
            except RuntimeError as e:
                print(f"[round {rnd + 1}/{args.rounds}] bs={bs}: "
                      f"inconclusive ({e})", flush=True)
                samples[bs].append(None)
                continue
            if 1.0 / dt > 3000.0:
                # Plausibility gate (cf. model_ab): beyond any roofline for
                # Large bf16 on v5e — an estimator glitch, not a fast phase.
                print(f"[round {rnd + 1}/{args.rounds}] bs={bs}: implausible "
                      f"sample ({1.0 / dt:.0f} clips/s) dropped", flush=True)
                samples[bs].append(None)
                continue
            samples[bs].append(dt)
            print(f"[round {rnd + 1}/{args.rounds}] bs={bs}: "
                  f"{dt * 1e6:.1f} us/clip = {1.0 / dt:.1f} clips/s",
                  flush=True)
        write_out(rnd + 1)
    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()

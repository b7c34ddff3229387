"""Shift-op microbenchmark: pallas vs conv vs select vs auto, drift-robust.

Times the 3D shift op alone (RubiksNet-Large stage shapes) on the current
device and writes SHIFT_MICROBENCH.json. Three measurements per stage:

- forward           (rubiks_shift_3d_forward)
- full custom VJP   (input-grad + shift-grad: the training hot path)
- isolated (3, C) shift-parameter gradient (the piece the reference's
  dedicated backward kernel accelerated, cuda_src/rubiks3d_kernels.cu:218-452,
  and the data behind auto_backend.OCCUPANCY_MIN)

This runtime's wall clock drifts up to 4x between sessions and ~2x within
one (docs/PERF_NOTES.md), so one-shot sequential timings cannot rank
backends. Like scripts/model_ab.py: all backends are compiled up front, then
timed round-robin for --rounds rounds (direction alternating to cancel
linear drift); the artifact records per-round samples, the MEDIAN per
backend, and the median PER-ROUND ratio of each backend vs the fastest
backend of that round — the ratio is computed within one round, so the
chip-phase multiplier divides out.

Results MERGE into --out: each (stage, mode) cell is overwritten when
re-measured, everything else is kept — so the artifact can be captured one
stage (or one mode) per invocation, each under its own timeout, on a runtime
where a single wedged compile can eat the whole window.

Usage: python scripts/shift_microbench.py [--out SHIFT_MICROBENCH.json]
       [--stages stage1,stage2,stage3] [--modes fwd,bwd,shift_grad]
       [--rounds 5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="SHIFT_MICROBENCH.json")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--max-shift", type=int, default=1)
    p.add_argument("--rounds", type=int, default=5,
                   help="interleaved timing rounds per stage")
    p.add_argument("--iters", type=int, default=33,
                   help="chained iterations per timing sample (the 32-iter "
                        "delta must clear the tunnel's ~0.5s fetch jitter; "
                        "ms-scale ops need >= 32)")
    p.add_argument("--stages", default="stage1,stage2,stage3",
                   help="comma subset of {stage1,stage2,stage3,stage4}")
    p.add_argument("--modes", default="fwd,bwd,shift_grad",
                   help="comma subset of {fwd,bwd,shift_grad}")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.ops import shift3d as s3d
    from rubiksnet_tpu.utils.benchmark import ChainedTimer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    k = args.max_shift
    all_shapes = {
        "stage1": (args.batch, 8, 56, 56, 72),
        "stage2": (args.batch, 8, 28, 28, 144),
        "stage3": (args.batch, 8, 14, 14, 288),
        "stage4": (args.batch, 8, 7, 7, 576),
    }
    shapes = {s: all_shapes[s] for s in args.stages.split(",")}
    modes_wanted = args.modes.split(",")

    # Merge into an existing artifact (stage+mode granularity) so the full
    # table can be assembled across several bounded invocations.
    results = {"cases": {}}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except (OSError, ValueError):
            results = {"cases": {}}
    results.update({"device": str(jax.devices()[0]), "dtype": args.dtype,
                    "max_shift": k, "rounds": args.rounds})
    results.setdefault("cases", {})

    def interleave(timers):
        """Round-robin sample each precompiled timer; per-round ratio vs the
        round's fastest. Returns
        {label: {ms: [...], median_ms, median_ratio_vs_best}}.
        An inconclusive sample (chained delta below the tunnel's fetch
        jitter) records as null and drops out of that round's ratio.
        """
        labels = list(timers)
        samples = {l: [] for l in labels}
        for rnd in range(args.rounds):
            order = labels if rnd % 2 == 0 else labels[::-1]
            for l in order:
                try:
                    samples[l].append(timers[l].sample(repeats=2) * 1e3)
                except RuntimeError:
                    samples[l].append(None)
        out = {}
        for l in labels:
            ratios = []
            for r in range(args.rounds):
                valid = [samples[b][r] for b in labels
                         if samples[b][r] is not None]
                if samples[l][r] is not None and valid:
                    ratios.append(samples[l][r] / min(valid))
            mine = [v for v in samples[l] if v is not None]
            if not mine:
                out[l] = {"error": "all rounds inconclusive"}
                continue
            out[l] = {
                "ms": [round(v, 3) if v is not None else None
                       for v in samples[l]],
                "median_ms": round(float(np.median(mine)), 3),
                # 1.0 = this backend WAS the round's fastest (median over
                # rounds); computed within-round so drift divides out.
                "median_ratio_vs_best": round(float(np.median(ratios)), 2),
            }
        return out

    for name, shape in shapes.items():
        x = jnp.asarray(np.random.RandomState(0).randn(*shape), dtype)
        shift = jnp.asarray(
            np.random.RandomState(1).uniform(-1.4, 1.4, (3, shape[-1])),
            jnp.float32,
        )
        og = jnp.asarray(np.random.RandomState(2).randn(*shape), dtype)

        def make_fwd(backend):
            return lambda x_: s3d.rubiks_shift_3d_forward(
                x_, shift, backend=backend, max_shift=k)

        def make_bwd(backend):
            def bwd(x_):
                def loss(xv):
                    out = s3d.rubiks_shift_3d(
                        xv, shift, backend=backend, max_shift=k)
                    return jnp.sum(out.astype(jnp.float32) ** 2)
                return jax.grad(loss)(x_)
            return bwd

        def make_sgrad(backend):
            return lambda og_: s3d.rubiks_shift_3d_shift_grad(
                og_, x, shift, backend=backend, max_shift=k)

        case = results["cases"].setdefault(name, {})
        for mode, maker, arg, backends in (
            ("fwd", make_fwd, x, ("pallas", "conv", "select", "auto")),
            ("bwd", make_bwd, x, ("pallas", "conv", "select", "auto")),
            ("shift_grad", make_sgrad, og, ("pallas", "gather", "auto")),
        ):
            if mode not in modes_wanted:
                continue
            timers, errors = {}, {}
            for b in backends:
                try:  # trace+compile up front, once per backend (not per
                    # round): on this runtime the retrace per sample is the
                    # dominant cost, and a support-check failure lands here
                    timers[b] = ChainedTimer(maker(b), arg,
                                             n_lo=1, n_hi=args.iters)
                except Exception as e:
                    errors[b] = str(e)[:120]
            timed = interleave(timers) if timers else {}
            timed.update({b: {"error": e} for b, e in errors.items()})
            case[mode] = timed
            for b, row in timed.items():
                if "median_ms" in row:
                    print(f"{name} {mode} {b}: median {row['median_ms']} ms "
                          f"(ratio-vs-best {row['median_ratio_vs_best']})",
                          flush=True)
            # Persist after every completed (stage, mode) cell: a timeout
            # later in the run must not discard measurements already taken.
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()

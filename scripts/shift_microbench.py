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
timed round-robin for --rounds rounds (seeded per-round shuffle to cancel
both linear drift and position bias); the artifact records per-round
samples, the MEDIAN per backend, and the median PER-ROUND ratio of each
backend vs the fastest backend of that round — the ratio is computed within
one round, so the chip-phase multiplier divides out. ``auto`` is recorded
as its trace-time resolution per cell (not re-timed: it lowers to the
identical HLO as the backend it picks, which XLA's executable cache
dedupes), next to the cell's measured ``winner`` for the agreement check.

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

        Order is a seeded per-round shuffle, not strict alternation: this
        chip's within-session drift has structure on the seconds timescale,
        and a fixed order gives edge positions a systematic penalty (an
        identical-HLO alias of the round winner measured a 5x 'loss' under
        first/last-alternation in the round-4 stage1 capture).
        """
        labels = list(timers)
        samples = {l: [] for l in labels}
        for rnd in range(args.rounds):
            order = [labels[i] for i in
                     np.random.RandomState(rnd).permutation(len(labels))]
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

        # `auto` is NOT timed as its own row: under jit it resolves to one
        # of the named backends at trace time and XLA's executable cache
        # dedupes the identical HLO, so timing it separately only measures
        # scheduling noise (observed: an identical-HLO alias 'losing' 5x to
        # itself). Instead each cell records what auto resolves to, checked
        # against the cell's measured winner.
        from rubiksnet_tpu.ops.auto_backend import (
            choose_forward_backend, choose_input_grad_backend,
            choose_shift_grad_backend,
        )

        ones, zeros = (1, 1, 1), (0, 0, 0)
        resolve = {
            "fwd": choose_forward_backend(
                shape, ones, zeros, False, k, dtype),
            "bwd": {
                "input_grad": choose_input_grad_backend(
                    shape, shape, ones, zeros, False, k, dtype),
                "shift_grad": choose_shift_grad_backend(
                    shape, shape, ones, zeros, k, dtype),
            },
            "shift_grad": choose_shift_grad_backend(
                shape, shape, ones, zeros, k, dtype),
        }

        case = results["cases"].setdefault(name, {})
        # In fwd/shift_grad mode `auto` lowers to the identical HLO of the
        # backend it resolves to (see above) — resolution-only. In bwd mode
        # `auto` is a COMPOSITION (forward backend + input-grad backend +
        # shift-grad backend chosen independently), which no single named
        # backend equals — e.g. stage1 resolves conv-fwd + select-grads — so
        # bwd times `auto` as its own row (VERDICT r4 weak #5: the bwd
        # auto row disagreed with the cell winner precisely because the
        # hybrid was never timed).
        for mode, maker, arg, backends in (
            ("fwd", make_fwd, x, ("pallas", "conv", "select", "mix")),
            ("bwd", make_bwd, x, ("pallas", "conv", "select", "mix",
                                  "auto")),
            ("shift_grad", make_sgrad, og, ("pallas", "gather", "select")),
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
            winner = min(
                (b for b in timed if "median_ratio_vs_best" in timed[b]),
                key=lambda b: timed[b]["median_ratio_vs_best"],
                default=None,
            )
            case[mode] = {
                "backends": timed,
                "winner": winner,
                "auto_resolves_to": resolve[mode],
            }
            for b, row in timed.items():
                if "median_ms" in row:
                    print(f"{name} {mode} {b}: median {row['median_ms']} ms "
                          f"(ratio-vs-best {row['median_ratio_vs_best']})",
                          flush=True)
            print(f"{name} {mode}: winner={winner} "
                  f"auto_resolves_to={resolve[mode]}", flush=True)
            # Persist after every completed (stage, mode) cell: a timeout
            # later in the run must not discard measurements already taken.
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()

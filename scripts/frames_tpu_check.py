"""On-TPU correctness artifact for the per-frame fused kernel.

CI runs ops/pallas/fused_frames.py in interpret mode on CPU; this script
compiles it on the real chip (Mosaic) and compares against the unfused
conv-backend block chain, recording the result as FRAMES_TPU_OK.json.
The interesting on-chip hazards are exactly the ones interpret mode cannot
see: Mosaic layout/slice miscompiles (this runtime miscompiles odd-offset
sublane slices of bf16 values) and VMEM overflows that fault the worker.

Checks (one subprocess shape each would isolate faults, but the worker
crash takes the whole process anyway — run with increasing risk):
  1. stage1 geometry (56x56x72, SE, f32 scratch, ws=1);
  2. stage1 forced ws=2 (split machinery incl. vbuf SE two-pass);
  3. stage0 geometry (112x112x72, SE, bf16 scratch, ws=7) — the shape the
     W-split schedule exists for.

Usage: python scripts/frames_tpu_check.py [--out FRAMES_TPU_OK.json]
       [--only stage1,stage1ws2,stage0]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _nerr(a, b):
    """Max abs error normalized by the reference's std (pointwise relative
    error is ill-conditioned through chained relus)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / max(float(np.std(b)), 1e-6))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="FRAMES_TPU_OK.json")
    p.add_argument("--only", default="stage1,stage1ws2,stage0")
    p.add_argument("--tol", type=float, default=0.1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.nn.backbone import RubiksShiftBlock
    from rubiksnet_tpu.ops.pallas.fused_block import (
        stack_block_params, stack_se_params,
    )
    from rubiksnet_tpu.ops.pallas.fused_frames import (
        fused_frames_run, pick_frames_plan,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_fused_block import _make_blocks

    dtype = jnp.bfloat16
    k = 1
    red = 12
    cases = {
        "stage1": ((2, 8, 56, 56, 72), None),
        "stage1ws2": ((2, 8, 56, 56, 72), 2),
        "stage0": ((2, 8, 112, 112, 72), None),
    }
    results = {
        "device": str(jax.devices()[0]),
        "compiled_on_tpu": jax.default_backend() == "tpu",
        "dtype": "bfloat16", "max_shift": k, "tol": args.tol,
        "checks": {}, "ok": True,
    }

    for name in args.only.split(","):
        shape, ws = cases[name]
        nb = 2
        params, stats = _make_blocks(jax.random.PRNGKey(len(name)), nb,
                                     shape[-1], 0.9, se_reduction=red)
        x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
        xd = x.astype(dtype)
        vt, wm = stack_block_params(params, stats, dtype, k)
        se = stack_se_params(params)
        plan = pick_frames_plan(shape, k, dtype, se=True)

        block = RubiksShiftBlock(
            in_planes=shape[-1], out_planes=shape[-1], stride=1,
            use_se=red, shift_backend="conv", shift_max_shift=k,
            dtype=dtype)

        def unfused(xv):
            for pp, ss in zip(params, stats):
                xv = block.apply(
                    {"params": pp, "batch_stats": ss}, xv, False)
            return xv

        t0 = time.time()
        try:
            got = np.asarray(
                fused_frames_run(xd, vt, wm, se, max_shift=k, ws=ws))
            want = np.asarray(jax.jit(unfused)(xd))
            err = _nerr(got, want)
            ok = bool(np.isfinite(got).all()) and err <= args.tol
        except Exception as e:  # record, keep going
            err, ok = None, False
            results["checks"][name] = {"error": repr(e)[:500]}
        results["checks"].setdefault(name, {}).update({
            "shape": list(shape),
            "plan": [str(plan[0]), plan[1], plan[2]] if plan else None,
            "ws_override": ws, "nerr": err, "ok": ok,
            "seconds": round(time.time() - t0, 1),
        })
        results["ok"] = results["ok"] and ok
        print(name, results["checks"][name], flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"ok": results["ok"], "out": args.out}))
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

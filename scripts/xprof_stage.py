"""Capture an on-chip profiler trace of one fused stage and print where the
time goes (top self-time ops), using xprof's xplane converters.

The chip-session wall-clock variance makes end-to-end timing a blunt tool;
this gives per-op attribution inside a single session instead. Requires
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the pure-python protobuf
fallback (set automatically below, must happen before protobuf import).

Usage: python scripts/xprof_stage.py --case stage3 [--config vpu] [--iters 8]
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default="stage3",
                   choices=["stage2", "stage3", "stage4", "stage1h",
                            "stage0h", "model"])
    p.add_argument("--config", default="vpu",
                   choices=["mxu", "vpu", "frames", "framesvpu", "auto"])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dir", default="/tmp/xprof_stage")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp

    from fused_ab import make_blocks  # sibling script
    from rubiksnet_tpu.ops.pallas.fused_block import (
        fused_block_run, stack_block_params,
    )
    from rubiksnet_tpu.ops.pallas.fused_frames import fused_frames_run

    bs = args.batch
    cases = {
        "stage2": ((bs, 8, 28, 28, 144), 7),
        "stage3": ((bs, 8, 14, 14, 288), 35),
        "stage4": ((bs, 8, 7, 7, 576), 2),
        "stage1h": ((bs, 8, 56, 56, 72), 2),
        "stage0h": ((bs, 8, 112, 112, 72), 1),
    }
    dtype = jnp.bfloat16
    k = 1

    if args.case == "model":
        from rubiksnet_tpu.models import create_rubiksnet
        from rubiksnet_tpu.models.fused_infer import fused_infer_apply

        bundle = create_rubiksnet(
            "large", num_classes=174, num_frames=8, input_size=64,
            dtype=dtype, shift_backend="auto", shift_max_shift=1,
        )
        x = jnp.asarray(
            np.random.RandomState(0).randn(bs, 8, 224, 224, 3), dtype)
        fn = jax.jit(
            lambda v: fused_infer_apply(bundle.model, bundle.variables, v))
    else:
        shape, nb = cases[args.case]
        n, t, h, w, c = shape
        x = jnp.asarray(np.random.RandomState(0).randn(*shape), dtype)
        params, stats = make_blocks(c, nb, k, dtype)
        vt, wm = stack_block_params(params, stats, dtype, k)
        mxu = {"mxu": True, "vpu": False, "frames": True, "framesvpu": False,
               "auto": None}[args.config]
        if args.config.startswith("frames"):
            fn = jax.jit(lambda xv: fused_frames_run(
                xv, vt, wm, max_shift=k, mxu_taps=mxu))
        else:
            fn = jax.jit(lambda xv: fused_block_run(
                xv, vt, wm, max_shift=k, mxu_taps=mxu))

    # Warm up (compile) outside the trace, then capture a few iterations.
    out = fn(x)
    out.block_until_ready()
    _ = float(jnp.sum(out))  # true completion fence on this runtime
    with jax.profiler.trace(args.dir):
        y = x
        for _ in range(args.iters):
            y = fn(y)
        y.block_until_ready()
        _ = float(jnp.sum(y))

    planes = sorted(glob.glob(
        os.path.join(args.dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert planes, f"no xplane under {args.dir}"
    xplane = planes[-1]
    print(f"xplane: {xplane}", flush=True)

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = json.loads(data) if data.lstrip().startswith("[") else None
    if rows is None:
        # hlo_stats returns JSON-wrapped csv in some versions; dump raw.
        open("/tmp/xprof_raw.txt", "w").write(data)
        print("raw tool output at /tmp/xprof_raw.txt (first 2000 chars):")
        print(data[:2000])
        return
    print(json.dumps(rows[:2], indent=1)[:1500])


if __name__ == "__main__":
    main()

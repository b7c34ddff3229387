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
                            "stage0h", "model", "train"])
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
    elif args.case == "train":
        # Per-op attribution of the FULL Large train step (scanned stages +
        # remat + auto shift backends, the bench.py --mode train program):
        # where the 3.9x train-step:forward ratio of BENCH_TRAIN_r04
        # actually goes — remat recompute, shift-grad reduction, matmul
        # backward, or SGD/BN bookkeeping (VERDICT r4 missing #4).
        from rubiksnet_tpu.models import create_rubiksnet
        from rubiksnet_tpu.train import (
            create_train_state, make_train_step, sgd_with_shift_mult,
        )

        bundle = create_rubiksnet(
            "large", num_classes=174, num_frames=8, input_size=64,
            dtype=dtype, shift_backend="auto", shift_max_shift=1,
            remat=True, scan_blocks=True,
        )
        tx = sgd_with_shift_mult(1e-3, 0.1)
        state = create_train_state(bundle, tx)
        video = jnp.asarray(
            np.random.RandomState(0).randn(bs, 8, 224, 224, 3), jnp.float32)
        labels = jnp.asarray(np.arange(bs) % 174, jnp.int32)
        step = jax.jit(lambda s: make_train_step(bundle.model, tx)(
            s, video, labels)[0])
        # Same shape in and out -> reuse the generic trace loop below.
        x = state
        fn = step
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

    def fence(v):
        # block_until_ready returns early on this runtime; a device fetch is
        # the only true completion fence.
        leaf = jax.tree_util.tree_leaves(v)[0]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))

    # Warm up (compile) outside the trace, then capture a few iterations.
    # Chain output->input when fn is an endomorphism (stage kernels, train
    # step); otherwise (model: video -> logits) re-invoke on the same input
    # — the device still executes the iterations back-to-back.
    out = fn(x)
    fence(out)
    chain = jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(x) and all(
            a.shape == b.shape for a, b in zip(
                jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(x)))
    with jax.profiler.trace(args.dir):
        y = x
        for _ in range(args.iters):
            y = fn(y) if chain else fn(x)
        fence(y)

    planes = sorted(glob.glob(
        os.path.join(args.dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert planes, f"no xplane under {args.dir}"
    xplane = planes[-1]
    print(f"xplane: {xplane}", flush=True)

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, (bytes, bytearray)):
        data = data.decode("utf-8", "replace")
    table = json.loads(data)  # google.visualization DataTable
    cols = [c["label"] for c in table["cols"]]
    rows = [[cell["v"] if cell else None for cell in r["c"]]
            for r in table.get("rows", [])]
    open("/tmp/xprof_hlo_stats.json", "w").write(
        json.dumps({"cols": cols, "rows": rows}))

    def col(label_frag):
        for i, label in enumerate(cols):
            if label_frag.lower() in label.lower():
                return i
        return None

    i_time = col("total self time (us)") or col("self time")
    i_name = col("hlo op name")
    i_cat = col("category")
    i_occ = col("occurrences")
    i_bound = col("bound by")
    i_bw = col("measured memory bw")
    i_gflops = col("model gflop")
    rows.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in rows)
    print(f"\ntotal device self-time: {total/1e3:.2f} ms across "
          f"{len(rows)} ops; top {args.top}:")
    for r in rows[:args.top]:
        t = r[i_time] or 0
        extras = []
        if i_bound is not None and r[i_bound]:
            extras.append(str(r[i_bound]))
        if i_gflops is not None and r[i_gflops]:
            extras.append(f"{float(r[i_gflops]):.0f} GF/s")
        if i_bw is not None and r[i_bw]:
            extras.append(f"{float(r[i_bw]):.0f} GiB/s")
        print(f"  {t/1e3:9.3f} ms {100*t/max(total,1e-9):5.1f}%  "
              f"x{r[i_occ] if i_occ is not None else '?':>4}  "
              f"[{r[i_cat] if i_cat is not None else '?'}] "
              f"{str(r[i_name])[:70]} " + " ".join(extras))
    # Category rollup: where does the time go by op class?
    agg = {}
    for r in rows:
        agg[r[i_cat]] = agg.get(r[i_cat], 0) + (r[i_time] or 0)
    print("\nby category:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e3:9.3f} ms {100*v/max(total,1e-9):5.1f}%  {k}")


if __name__ == "__main__":
    main()

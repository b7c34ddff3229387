"""On-TPU correctness artifact for the Pallas kernels.

CI runs the Pallas kernels in interpret mode on CPU; this script runs them
compiled on the real chip and records the result, so on-TPU correctness is a
checked artifact (PALLAS_TPU_OK.json) rather than a prose claim.

Each check runs under an exception guard and the artifact is flushed after
every section: one bad kernel (e.g. a Mosaic verification rejection, which
surfaces as a compile-time error) records a failed entry instead of losing
the other results.

Checks:
  1. fused multi-block kernel (ops/pallas/fused_block.py) vs the unfused
     conv-backend block chain, bf16 and f32 (+ the batched-SE schedule);
  2. fused one-pass shift kernel (ops/pallas/fused_shift3d.py) vs the
     select backend, stride 1 and the de-interleaved stride-2 path;
  2d. one-pass (3, C) shift-gradient kernel (ops/pallas/shift_grad_kernel.py)
      vs the select-unroll, at the Large stage shapes (C=288/576) where the
      >=0.7-lane-occupancy auto heuristic picks it for training;
  3/4. fused end-to-end Large-tier inference (plain + AQ) vs model.apply.

Usage: python scripts/pallas_tpu_check.py [--out PALLAS_TPU_OK.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _nerr(a, b):
    """Max abs error normalized by the reference's scale. Chained random
    blocks are ill-conditioned for pointwise relative error (two correct f32
    implementations diverge through relu boundaries), so errors are judged
    against the tensor's standard deviation."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / max(float(np.std(b)), 1e-6))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PALLAS_TPU_OK.json")
    p.add_argument("--only", default=None,
                   help="comma subset of check names to run (merges into "
                        "an existing artifact instead of replacing it)")
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()  # persistent compile cache on TPU (slow tunnel)

    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.models.fused_infer import fused_infer_apply
    from rubiksnet_tpu.nn.backbone import RubiksShiftBlock
    from rubiksnet_tpu.ops.pallas.fused_block import (
        fused_block_run, stack_block_params, stack_se_params,
    )
    from rubiksnet_tpu.ops.pallas.fused_entry import (
        fused_entry_run, stack_entry_params,
    )
    from rubiksnet_tpu.ops.shift3d import rubiks_shift_3d_forward

    backend = jax.default_backend()
    checks_prev = {}
    if args.only and os.path.exists(args.out):
        try:
            with open(args.out) as f:
                checks_prev = json.load(f).get("checks", {})
        except (OSError, ValueError):
            pass
    results = {
        "device": str(jax.devices()[0]),
        "backend": backend,
        "compiled_on_tpu": backend == "tpu",
        "checks": checks_prev,
        "timestamp": time.time(),
    }

    expected_names = []  # filled before the run loop (ADVICE r4: a partial
    # run must not claim ok over completed checks only)

    def flush():
        missing = [n for n in expected_names if n not in results["checks"]]
        results["missing_checks"] = missing
        results["ok"] = bool(
            not missing
            and results["checks"]
            and all(c.get("pass") for c in results["checks"].values()))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    def record(name, entry, passed):
        entry["pass"] = bool(passed)
        results["checks"][name] = entry
        print(f"{name}: {entry}", flush=True)

    def u(k_, shape, lo, hi):
        return jax.random.uniform(k_, shape, jnp.float32, lo, hi)

    def make_blocks(key, c, nb, shift_hi, se_red=None):
        params, stats = [], []
        for _ in range(nb):
            key, *ks = jax.random.split(key, 10)
            params.append({
                "bn1": {"scale": u(ks[0], (c,), 0.5, 1.5),
                        "bias": u(ks[1], (c,), -0.3, 0.3)},
                "bn2": {"scale": u(ks[2], (c,), 0.5, 1.5),
                        "bias": u(ks[3], (c,), -0.3, 0.3)},
                "conv2": {"kernel":
                          jax.random.normal(ks[4], (1, 1, c, c))
                          / np.sqrt(c)},
                "conv3": {"kernel":
                          jax.random.normal(ks[5], (1, 1, c, c))
                          / (2 * np.sqrt(c))},
                "as3": {"rubiks3d": {"shift":
                                     u(ks[6], (3, c), -shift_hi, shift_hi)}},
            })
            if se_red:
                params[-1]["se"] = {
                    "fc1": {"kernel": jax.random.normal(
                        ks[7], (c, c // se_red)) / np.sqrt(c)},
                    "fc2": {"kernel": jax.random.normal(
                        ks[8], (c // se_red, c)) / np.sqrt(c // se_red)},
                }
            stats.append({
                "bn1": {"mean": u(ks[6], (c,), -0.2, 0.2),
                        "var": u(ks[0], (c,), 0.5, 2.0)},
                "bn2": {"mean": u(ks[1], (c,), -0.2, 0.2),
                        "var": u(ks[2], (c,), 0.5, 2.0)},
            })
        return params, stats

    # --- 1. fused multi-block kernel: compiled-on-TPU vs interpret (same
    # math, must agree to rounding), and vs the unfused conv-backend chain
    # (std-normalized error; see _nerr). ---
    def check_fused_block(dtype, tol):
        c, max_shift, nb = 128, 2, 3
        params, stats = make_blocks(jax.random.PRNGKey(0), c, nb, 1.8)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 14, 14, c),
                              dtype)
        vt, wm = stack_block_params(params, stats, dtype, max_shift)
        got = jax.jit(
            lambda x_: fused_block_run(x_, vt, wm, max_shift=max_shift)
        )(x)
        interp = fused_block_run(x, vt, wm, max_shift=max_shift,
                                 interpret=True)
        block = RubiksShiftBlock(
            in_planes=c, out_planes=c, stride=1, shift_backend="conv",
            shift_max_shift=max_shift, dtype=dtype)
        want = x
        for pp, ss in zip(params, stats):
            want = block.apply({"params": pp, "batch_stats": ss}, want,
                               False)
        err_interp = _nerr(got, interp)
        err_unfused = _nerr(got, want)
        return ({"err_vs_interpret": err_interp,
                 "err_vs_unfused": err_unfused, "tol": tol},
                err_interp < tol and err_unfused < max(tol, 2e-2))

    # --- 1b. batched-SE schedule vs per-frame SE, compiled on chip ---
    def check_se_batch(dtype, tol):
        c, max_shift, nb, red = 144, 1, 2, 12
        params, stats = make_blocks(jax.random.PRNGKey(31), c, nb, 0.9,
                                    se_red=red)
        x = jax.random.normal(jax.random.PRNGKey(32), (2, 4, 14, 14, c),
                              dtype)
        vt, wm = stack_block_params(params, stats, dtype, max_shift)
        se_w = stack_se_params(params)
        batched = jax.jit(lambda x_: fused_block_run(
            x_, vt, wm, se_w, max_shift=max_shift, se_batch=True))(x)
        perframe = jax.jit(lambda x_: fused_block_run(
            x_, vt, wm, se_w, max_shift=max_shift, se_batch=False))(x)
        err = _nerr(batched, perframe)
        return {"err_vs_perframe": err, "tol": tol}, err < tol

    # --- 1c. fused strided entry-block kernel vs the unfused block ---
    def check_fused_entry(dtype, tol):
        cin, mid, red = 72, 144, 12
        ks = jax.random.split(jax.random.PRNGKey(21), 12)
        p = {
            "bn1": {"scale": u(ks[0], (cin,), 0.5, 1.5),
                    "bias": u(ks[1], (cin,), -0.3, 0.3)},
            "bn2": {"scale": u(ks[2], (mid,), 0.5, 1.5),
                    "bias": u(ks[3], (mid,), -0.3, 0.3)},
            "conv2": {"kernel": jax.random.normal(
                ks[4], (1, 1, cin, mid)) / np.sqrt(cin)},
            "conv3": {"kernel": jax.random.normal(
                ks[5], (1, 1, mid, mid)) / np.sqrt(mid)},
            "shortcut": {"kernel": jax.random.normal(
                ks[6], (1, 1, cin, mid)) / np.sqrt(cin)},
            "as3": {"rubiks3d": {"shift": u(ks[7], (3, mid), -0.9, 0.9)}},
            "se": {"fc1": {"kernel": jax.random.normal(
                       ks[8], (mid, mid // red)) / np.sqrt(mid)},
                   "fc2": {"kernel": jax.random.normal(
                       ks[9], (mid // red, mid)) / np.sqrt(mid // red)}},
        }
        st = {
            "bn1": {"mean": u(ks[10], (cin,), -0.2, 0.2),
                    "var": u(ks[10], (cin,), 0.5, 2.0)},
            "bn2": {"mean": u(ks[11], (mid,), -0.2, 0.2),
                    "var": u(ks[11], (mid,), 0.5, 2.0)},
        }
        x = jax.random.normal(jax.random.PRNGKey(22), (2, 4, 56, 56, cin),
                              dtype)
        entry = stack_entry_params(p, st, dtype, 1)
        se_w = stack_se_params([p])[0]
        got = jax.jit(lambda x_: fused_entry_run(
            x_, entry, se_w, max_shift=1))(x)
        interp = fused_entry_run(x, entry, se_w, max_shift=1,
                                 interpret=True)
        block = RubiksShiftBlock(
            in_planes=cin, out_planes=mid, stride=2, shift_backend="conv",
            shift_max_shift=1, dtype=dtype, use_se=red)
        want = jax.jit(lambda x_: block.apply(
            {"params": p, "batch_stats": st}, x_, False))(x)
        # vs interpret: same math, must agree to rounding. vs unfused: the
        # fold_bn-vs-flax-BN rounding difference crosses relu boundaries,
        # so judge against the 2e-2 std band (same as fused_block).
        err_interp = _nerr(got, interp)
        err_unfused = _nerr(got, want)
        return ({"err_vs_interpret": err_interp,
                 "err_vs_unfused": err_unfused, "tol": tol},
                err_interp < tol and err_unfused < max(tol, 2e-2))

    # --- 2. fused one-pass shift kernel vs select backend ---
    # bf16 tol: the kernel computes taps in f32 and rounds once; the select
    # reference rounds per-axis in bf16, so a few percent of std is expected.
    # The kernel under test is asserted reachable (ADVICE r4: the round-4
    # stride-2 check silently fell back to select and compared select vs
    # select — the fused stride-2 kernel is now invoked directly).
    def check_fused_shift3d(dtype, tol, stride):
        from rubiksnet_tpu.ops.pallas.fused_shift3d import (
            fused_shift3d_supported, rubiks_shift_3d_fused,
        )
        from rubiksnet_tpu.ops.pallas.shift_kernel import (
            shift3d_pallas_supported,
        )

        c = 128
        t = 8 if stride == (1, 1, 1) else 4
        k = 2 if stride == (1, 1, 1) else 1
        x = jax.random.normal(jax.random.PRNGKey(2), (2, t, 12, 12, c),
                              dtype)
        # Stay 0.5 off the integer-shift boundary for the stride-1 bf16
        # check: near-integer shifts amplify the one-rounding-vs-per-axis-
        # rounding difference between the kernel and the select reference.
        hi = float(k) - (0.5 if stride == (1, 1, 1) else 0.0)
        shift = jax.random.uniform(
            jax.random.PRNGKey(3), (3, c), jnp.float32, -hi, hi)
        if stride == (1, 1, 1):
            # Production path: shift3d.py routes backend="pallas" to the
            # one-pass shift_kernel for stride-1 — assert it really does.
            assert shift3d_pallas_supported(x.shape, stride, (0, 0, 0), k,
                                            dtype), "pallas path not taken"
            got = jax.jit(lambda x_: rubiks_shift_3d_forward(
                x_, shift, stride=stride, backend="pallas", max_shift=k))(x)
            kernel = "shift_kernel"
        else:
            # Strided: the one-pass kernel rejects s>1; the de-interleaved
            # fused_shift3d kernel is the strided formulation — call it
            # directly so the check exercises the kernel it names.
            assert fused_shift3d_supported(x.shape, stride, (0, 0, 0), k,
                                           dtype), "fused s2 not supported"
            got = jax.jit(lambda x_: rubiks_shift_3d_fused(
                x_, shift, stride, (0, 0, 0), False, k))(x)
            kernel = "fused_shift3d"
        want = jax.jit(lambda x_: rubiks_shift_3d_forward(
            x_, shift, stride=stride, backend="select", max_shift=k))(x)
        err = _nerr(got, want)
        # Sanity guard against a vacuous same-path comparison: in bf16 the
        # kernel's one-rounding schedule must differ measurably from the
        # select reference's per-axis rounding for fractional shifts.
        vacuous = dtype == jnp.bfloat16 and err == 0.0
        return ({"max_rel_err": err, "tol": tol, "kernel": kernel,
                 **({"vacuous": True} if vacuous else {})},
                err < tol and not vacuous)

    # --- 2d. one-pass shift-grad kernel vs the select-unroll, at the Large
    # stage shapes the auto heuristic routes to it during training
    # (C=288 stage2 / C=576 stage3 lane occupancies are 1.0 >= 0.7). ---
    def check_shift_grad(dtype, tol, c, hw, max_shift):
        from rubiksnet_tpu.ops.auto_backend import choose_shift_grad_backend
        from rubiksnet_tpu.ops.shift3d import rubiks_shift_3d_shift_grad

        shape = (2, 8, hw, hw, c)
        x = jax.random.normal(jax.random.PRNGKey(41), shape, dtype)
        og = jax.random.normal(jax.random.PRNGKey(42), shape, dtype)
        hi = float(max_shift) - 0.1
        shift = jax.random.uniform(
            jax.random.PRNGKey(43), (3, c), jnp.float32, -hi, hi)
        picked = choose_shift_grad_backend(
            shape, shape, (1, 1, 1), (0, 0, 0), max_shift, dtype)
        got = jax.jit(lambda og_, x_: rubiks_shift_3d_shift_grad(
            og_, x_, shift, backend="pallas", max_shift=max_shift))(og, x)
        want = jax.jit(lambda og_, x_: rubiks_shift_3d_shift_grad(
            og_, x_, shift, backend="select", max_shift=max_shift))(og, x)
        err = _nerr(got, want)
        return ({"err_vs_select": err, "tol": tol, "auto_picks": picked},
                err < tol and picked == "pallas")

    # --- 3/4. fused end-to-end Large inference vs regular apply (bf16) ---
    def check_fused_infer(variant, use_entry=False):
        bundle = create_rubiksnet(
            "large", num_classes=174, num_frames=8, input_size=64,
            dtype=jnp.bfloat16, variant=variant, shift_backend="conv",
            shift_max_shift=2)
        video = jax.random.normal(
            jax.random.PRNGKey(4), (2, 8, 112, 112, 3), jnp.bfloat16)
        want = jax.jit(
            lambda v: bundle.model.apply(bundle.variables, v, train=False)
        )(video)
        prev = os.environ.get("RUBIKS_FUSED_ENTRY")
        os.environ["RUBIKS_FUSED_ENTRY"] = "1" if use_entry else "0"
        try:
            got = jax.jit(
                lambda v: fused_infer_apply(bundle.model, bundle.variables,
                                            v))(video)
        finally:
            if prev is None:
                os.environ.pop("RUBIKS_FUSED_ENTRY", None)
            else:
                os.environ["RUBIKS_FUSED_ENTRY"] = prev
        err = _nerr(got, want)
        # std-normalized logit error; bf16 accumulation diffs
        return {"norm_logit_err": err, "tol": 0.1}, err < 0.1

    checks = [
        ("fused_block_float32",
         lambda: check_fused_block(jnp.float32, 1e-4)),
        ("fused_block_bfloat16",
         lambda: check_fused_block(jnp.bfloat16, 5e-2)),
        ("fused_block_se_batch_float32",
         lambda: check_se_batch(jnp.float32, 1e-4)),
        ("fused_block_se_batch_bfloat16",
         lambda: check_se_batch(jnp.bfloat16, 5e-2)),
        ("fused_entry_float32",
         lambda: check_fused_entry(jnp.float32, 1e-4)),
        ("fused_entry_bfloat16",
         lambda: check_fused_entry(jnp.bfloat16, 5e-2)),
        ("fused_shift3d_float32",
         lambda: check_fused_shift3d(jnp.float32, 1e-5, (1, 1, 1))),
        ("fused_shift3d_bfloat16",
         lambda: check_fused_shift3d(jnp.bfloat16, 5e-2, (1, 1, 1))),
        ("fused_shift3d_s2_float32",
         lambda: check_fused_shift3d(jnp.float32, 1e-5, (1, 2, 2))),
        ("fused_shift3d_s2_bfloat16",
         lambda: check_fused_shift3d(jnp.bfloat16, 5e-2, (1, 2, 2))),
        ("shift_grad_c288_float32",
         lambda: check_shift_grad(jnp.float32, 1e-3, 288, 14, 2)),
        ("shift_grad_c288_bfloat16",
         lambda: check_shift_grad(jnp.bfloat16, 5e-2, 288, 14, 2)),
        ("shift_grad_c576_float32",
         lambda: check_shift_grad(jnp.float32, 1e-3, 576, 7, 1)),
        ("shift_grad_c576_bfloat16",
         lambda: check_shift_grad(jnp.bfloat16, 5e-2, 576, 7, 1)),
        ("fused_infer_large_bf16",
         lambda: check_fused_infer("rubiks3d")),
        ("fused_infer_large_entry_bf16",
         lambda: check_fused_infer("rubiks3d", use_entry=True)),
        ("fused_infer_large_aq_bf16",
         lambda: check_fused_infer("rubiks3d-aq")),
    ]
    only = set(args.only.split(",")) if args.only else None
    # With --only, previously-recorded checks stay expected (merge mode);
    # a full run expects every check in the list.
    expected_names.extend(
        sorted({n for n, _ in checks if not only or n in only}
               | set(checks_prev)))
    for name, fn in checks:
        if only and name not in only:
            continue
        try:
            entry, passed = fn()
            record(name, entry, passed)
        except Exception as e:  # noqa: BLE001 — record, keep going
            record(name, {"error": repr(e)[:500]}, False)
        flush()

    flush()
    print(json.dumps({"ok": results["ok"], "out": args.out}))
    sys.exit(0 if results["ok"] else 1)


if __name__ == "__main__":
    main()

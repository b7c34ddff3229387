"""On-TPU correctness artifact for the Pallas kernels.

CI runs the Pallas kernels in interpret mode on CPU; this script runs them
compiled on the real chip and records the result, so on-TPU correctness is a
checked artifact (PALLAS_TPU_OK.json) rather than a prose claim.

Checks:
  1. fused multi-block kernel (ops/pallas/fused_block.py) vs the unfused
     conv-backend block chain, bf16 and f32;
  2. fused one-pass shift kernel (ops/pallas/fused_shift3d.py) vs the
     select backend;
  3. fused end-to-end Large-tier inference vs the regular model.apply.

Usage: python scripts/pallas_tpu_check.py [--out PALLAS_TPU_OK.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _mad(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = np.maximum(np.abs(b), 1e-3)
    return float(np.max(np.abs(a - b) / denom))


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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.models.fused_infer import fused_infer_apply
    from rubiksnet_tpu.nn.backbone import RubiksShiftBlock
    from rubiksnet_tpu.ops.pallas.fused_block import (
        fused_block_run, stack_block_params,
    )
    from rubiksnet_tpu.ops.shift3d import rubiks_shift_3d_forward

    backend = jax.default_backend()
    results = {
        "device": str(jax.devices()[0]),
        "backend": backend,
        "compiled_on_tpu": backend == "tpu",
        "checks": {},
        "timestamp": time.time(),
    }
    ok = True

    # --- 1. fused multi-block kernel: compiled-on-TPU vs interpret (same
    # math, must agree to rounding), and vs the unfused conv-backend chain
    # (std-normalized error; see _nerr). ---
    for dtype_name, dtype, tol in (("float32", jnp.float32, 1e-4),
                                   ("bfloat16", jnp.bfloat16, 5e-2)):
        key = jax.random.PRNGKey(0)
        c, max_shift, nb = 128, 2, 3
        n, t, h, w = 2, 8, 14, 14
        params, stats = [], []
        for i in range(nb):
            key, *ks = jax.random.split(key, 8)
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
                "as3": {"rubiks3d": {"shift": u(ks[6], -1.8, 1.8, (3, c))}},
            })
            stats.append({
                "bn1": {"mean": u(ks[6], -0.2, 0.2, (c,)),
                        "var": u(ks[0], 0.5, 2.0, (c,))},
                "bn2": {"mean": u(ks[1], -0.2, 0.2, (c,)),
                        "var": u(ks[2], 0.5, 2.0, (c,))},
            })
        x = jax.random.normal(jax.random.PRNGKey(1), (n, t, h, w, c), dtype)
        vt, wm = stack_block_params(params, stats, dtype, max_shift)
        got = jax.jit(
            lambda x_: fused_block_run(x_, vt, wm, max_shift=max_shift)
        )(x)
        interp = fused_block_run(x, vt, wm, max_shift=max_shift, interpret=True)
        block = RubiksShiftBlock(
            in_planes=c, out_planes=c, stride=1, shift_backend="conv",
            shift_max_shift=max_shift, dtype=dtype)
        want = x
        for pp, ss in zip(params, stats):
            want = block.apply({"params": pp, "batch_stats": ss}, want, False)
        err_interp = _nerr(got, interp)
        err_unfused = _nerr(got, want)
        passed = err_interp < tol and err_unfused < max(tol, 2e-2)
        ok &= passed
        results["checks"][f"fused_block_{dtype_name}"] = {
            "err_vs_interpret": err_interp, "err_vs_unfused": err_unfused,
            "tol": tol, "pass": passed}
        print(f"fused_block {dtype_name}: vs_interpret={err_interp:.2e} "
              f"vs_unfused={err_unfused:.2e} pass={passed}", flush=True)

    # --- 1b. batched-SE schedule vs per-frame SE, compiled on chip ---
    from rubiksnet_tpu.ops.pallas.fused_block import stack_se_params as _ssp

    for dtype_name, dtype, tol in (("float32", jnp.float32, 1e-4),
                                   ("bfloat16", jnp.bfloat16, 5e-2)):
        key = jax.random.PRNGKey(31)
        c, max_shift, nb, red = 144, 1, 2, 12
        params, stats = [], []
        for i in range(nb):
            key, *ks = jax.random.split(key, 10)
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
                "as3": {"rubiks3d": {"shift": u(ks[6], -0.9, 0.9, (3, c))}},
                "se": {"fc1": {"kernel": jax.random.normal(
                           ks[7], (c, c // red)) / np.sqrt(c)},
                       "fc2": {"kernel": jax.random.normal(
                           ks[8], (c // red, c)) / np.sqrt(c // red)}},
            })
            stats.append({
                "bn1": {"mean": u(ks[6], -0.2, 0.2, (c,)),
                        "var": u(ks[0], 0.5, 2.0, (c,))},
                "bn2": {"mean": u(ks[1], -0.2, 0.2, (c,)),
                        "var": u(ks[2], 0.5, 2.0, (c,))},
            })
        x = jax.random.normal(jax.random.PRNGKey(32), (2, 4, 14, 14, c),
                              dtype)
        vt, wm = stack_block_params(params, stats, dtype, max_shift)
        se_w = _ssp(params)
        batched = jax.jit(lambda x_: fused_block_run(
            x_, vt, wm, se_w, max_shift=max_shift, se_batch=True))(x)
        perframe = jax.jit(lambda x_: fused_block_run(
            x_, vt, wm, se_w, max_shift=max_shift, se_batch=False))(x)
        err = _nerr(batched, perframe)
        passed = err < tol
        ok &= passed
        results["checks"][f"fused_block_se_batch_{dtype_name}"] = {
            "err_vs_perframe": err, "tol": tol, "pass": passed}
        print(f"fused_block se_batch {dtype_name}: err={err:.2e} "
              f"pass={passed}", flush=True)

    # --- 2. fused one-pass shift kernel vs select backend ---
    # bf16 tol: the kernel computes taps in f32 and rounds once; the select
    # reference rounds per-axis in bf16, so a few percent of std is expected.
    for dtype_name, dtype, tol in (("float32", jnp.float32, 1e-5),
                                   ("bfloat16", jnp.bfloat16, 5e-2)):
        c = 128
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12, 12, c), dtype)
        shift = jax.random.uniform(
            jax.random.PRNGKey(3), (3, c), jnp.float32, -1.5, 1.5)
        got = jax.jit(lambda x_: rubiks_shift_3d_forward(
            x_, shift, backend="pallas", max_shift=2))(x)
        want = jax.jit(lambda x_: rubiks_shift_3d_forward(
            x_, shift, backend="select", max_shift=2))(x)
        err = _nerr(got, want)
        passed = err < tol
        ok &= passed
        results["checks"][f"fused_shift3d_{dtype_name}"] = {
            "max_rel_err": err, "tol": tol, "pass": passed}
        print(f"fused_shift3d {dtype_name}: err={err:.2e} pass={passed}",
              flush=True)

    # --- 2b. strided (s=2) one-pass shift kernel: exercises the f32
    # strided value slices the entry kernel also relies on ---
    for dtype_name, dtype, tol in (("float32", jnp.float32, 1e-5),):
        c = 128
        x = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 12, 12, c),
                              dtype)
        shift = jax.random.uniform(
            jax.random.PRNGKey(13), (3, c), jnp.float32, -1.0, 1.0)
        got = jax.jit(lambda x_: rubiks_shift_3d_forward(
            x_, shift, stride=(1, 2, 2), backend="pallas", max_shift=1))(x)
        want = jax.jit(lambda x_: rubiks_shift_3d_forward(
            x_, shift, stride=(1, 2, 2), backend="select", max_shift=1))(x)
        err = _nerr(got, want)
        passed = err < tol
        ok &= passed
        results["checks"][f"fused_shift3d_s2_{dtype_name}"] = {
            "max_rel_err": err, "tol": tol, "pass": passed}
        print(f"fused_shift3d s2 {dtype_name}: err={err:.2e} pass={passed}",
              flush=True)

    # --- 2c. fused strided entry-block kernel vs the unfused block ---
    from rubiksnet_tpu.ops.pallas.fused_block import stack_se_params
    from rubiksnet_tpu.ops.pallas.fused_entry import (
        fused_entry_run, stack_entry_params,
    )

    for dtype_name, dtype, tol in (("float32", jnp.float32, 1e-4),
                                   ("bfloat16", jnp.bfloat16, 5e-2)):
        cin, mid, red = 72, 144, 12
        key = jax.random.PRNGKey(21)
        ks = jax.random.split(key, 12)
        u = lambda k_, shape, lo, hi: jax.random.uniform(
            k_, shape, jnp.float32, lo, hi)
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
        block = RubiksShiftBlock(
            in_planes=cin, out_planes=mid, stride=2, shift_backend="conv",
            shift_max_shift=1, dtype=dtype, use_se=red)
        want = jax.jit(lambda x_: block.apply(
            {"params": p, "batch_stats": st}, x_, False))(x)
        err = _nerr(got, want)
        passed = err < max(tol, 2e-2) if dtype_name == "bfloat16" else (
            err < tol)
        ok &= passed
        results["checks"][f"fused_entry_{dtype_name}"] = {
            "err_vs_unfused": err, "tol": tol, "pass": passed}
        print(f"fused_entry {dtype_name}: err={err:.2e} pass={passed}",
              flush=True)

    # --- 3. fused end-to-end Large inference vs regular apply (bf16) ---
    bundle = create_rubiksnet(
        "large", num_classes=174, num_frames=8, input_size=64,
        dtype=jnp.bfloat16, shift_backend="conv", shift_max_shift=2)
    video = jax.random.normal(
        jax.random.PRNGKey(4), (2, 8, 112, 112, 3), jnp.bfloat16)
    want = jax.jit(
        lambda v: bundle.model.apply(bundle.variables, v, train=False))(video)
    got = jax.jit(
        lambda v: fused_infer_apply(bundle.model, bundle.variables, v))(video)
    err = _nerr(got, want)
    passed = err < 0.1  # std-normalized logit error; bf16 accumulation diffs
    ok &= passed
    results["checks"]["fused_infer_large_bf16"] = {
        "norm_logit_err": err, "tol": 0.1, "pass": passed}
    print(f"fused_infer large bf16: norm logit err={err:.3e} pass={passed}",
          flush=True)

    # --- 4. the AQ variant (in-kernel softmax 3-tap attention shift) ---
    bundle = create_rubiksnet(
        "large", num_classes=174, num_frames=8, input_size=64,
        dtype=jnp.bfloat16, variant="rubiks3d-aq", shift_backend="conv",
        shift_max_shift=2)
    want = jax.jit(
        lambda v: bundle.model.apply(bundle.variables, v, train=False))(video)
    got = jax.jit(
        lambda v: fused_infer_apply(bundle.model, bundle.variables, v))(video)
    err = _nerr(got, want)
    passed = err < 0.1
    ok &= passed
    results["checks"]["fused_infer_large_aq_bf16"] = {
        "norm_logit_err": err, "tol": 0.1, "pass": passed}
    print(f"fused_infer large AQ bf16: norm logit err={err:.3e} pass={passed}",
          flush=True)

    results["ok"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"ok": results["ok"], "out": args.out}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

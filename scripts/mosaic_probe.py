"""On-chip probes for Mosaic value-op legality on this runtime.

Each probe compiles a minimal Pallas kernel exercising one construct the
fused kernels want to rely on, and checks the numerics against numpy. Run
before building on a new construct: this runtime's Mosaic/axon stack
rejects some ops at compile time (e.g. ALL strided vector slices:
"expected strides to be confined to [1, 2)") and silently miscompiles
others (odd-offset bf16 value slices — see fused_block.py).

Usage: python scripts/mosaic_probe.py [--probes reshape_split,...]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probes", default="reshape_split,reshape_split_slice,"
                   "deint_taps,strided_slice_major")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from rubiksnet_tpu.utils.platform import select_platform

    select_platform()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {"backend": jax.default_backend(), "probes": {}}

    def run(name, kernel, x, out_shape, expect):
        got = None
        try:
            got = np.asarray(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x))
            err = float(np.abs(got - expect).max())
            ok = bool(err < 1e-5)
            results["probes"][name] = {"ok": ok, "err": err}
        except Exception as e:  # compile- or verify-time rejection
            results["probes"][name] = {"ok": False,
                                       "error": repr(e)[:300]}
        print(name, results["probes"][name], flush=True)

    which = set(args.probes.split(","))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 16, 128), jnp.float32)
    xn = np.asarray(x)

    if "reshape_split_slice" in which:
        # Split the untiled major dim of a rank-3 f32 value into (h/2, 2),
        # take one parity with a unit-stride slice, drop the axis. This is
        # the H-decimation construct for the strided entry kernel.
        def k_rss(x_ref, o_ref):
            v = x_ref[...].astype(jnp.float32)
            v4 = v.reshape(8, 2, 16, 128)
            o_ref[...] = v4[:, 0] + 2.0 * v4[:, 1]

        run("reshape_split_slice", k_rss, x, (8, 16, 128),
            xn[0::2] + 2.0 * xn[1::2])

    if "reshape_split" in which:
        # Same split, but reduce over the parity axis (no slice).
        def k_rs(x_ref, o_ref):
            v = x_ref[...].astype(jnp.float32)
            o_ref[...] = v.reshape(8, 2, 16, 128).sum(axis=1)

        run("reshape_split", k_rs, x, (8, 16, 128), xn[0::2] + xn[1::2])

    if "deint_taps" in which:
        # De-interleaved W taps: halves [E | O] each 8 cols; compute
        # out_E[q] = a*v[2q-1] + b*v[2q] + c*v[2q+1] with unit slices only.
        w = jnp.asarray(rng.randn(16, 16, 128), jnp.float32)
        wn = np.asarray(w)
        # natural v: v[i] = E[i//2] if i even else O[i//2]
        # Here treat wn's first 8 sublanes as E, last 8 as O of a width-16
        # natural array vnat[2q]=E[q], vnat[2q+1]=O[q].
        vnat = np.zeros((16, 16, 128), np.float32)
        vnat[:, 0::2] = wn[:, :8]
        vnat[:, 1::2] = wn[:, 8:]
        a, b, c = 0.25, 0.5, 0.125
        expect = np.zeros((16, 8, 128), np.float32)
        for q in range(8):
            src_m1 = vnat[:, 2 * q - 1] if 2 * q - 1 >= 0 else 0.0
            src_p1 = vnat[:, 2 * q + 1]
            expect[:, q] = a * src_m1 + b * vnat[:, 2 * q] + c * src_p1

        def k_dt(x_ref, o_ref):
            v = x_ref[...].astype(jnp.float32)
            E = v[:, 0:8]
            O = v[:, 8:16]
            zcol = jnp.zeros((16, 1, 128), jnp.float32)
            o_m1 = jnp.concatenate([zcol, O[:, 0:7]], axis=1)  # O[q-1]
            o_ref[...] = a * o_m1 + b * E + c * O

        run("deint_taps", k_dt, w, (16, 8, 128), expect)

    if "strided_slice_major" in which:
        # Known-rejected: stride-2 slice on the untiled major axis.
        import jax.lax as lax

        def k_ss(x_ref, o_ref):
            v = x_ref[...].astype(jnp.float32)
            o_ref[...] = lax.slice_in_dim(v, 0, 15, stride=2, axis=0)

        run("strided_slice_major", k_ss, x, (8, 16, 128), xn[0:15:2])

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps({k: v.get("ok") for k, v in results["probes"].items()}))


if __name__ == "__main__":
    main()

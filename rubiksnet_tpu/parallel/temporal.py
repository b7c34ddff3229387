"""Sequence (temporal) parallelism for RubiksShift via ring halo exchange.

The reference processes the whole clip on one device (T=8 everywhere,
/root/reference/rubiksnet/models.py:112-117); SURVEY §2.6 notes the TPU-native
extension: RubiksShift's temporal receptive field is bounded by the tap
window (``max_shift`` ⇒ taps reach ≤ K frames, rubiks3d_kernels.cu:59-74),
so sharding T over a mesh axis only requires exchanging K boundary frames
with ring neighbors — one `lax.ppermute` each way — before running the
shift locally. Everything else in the backbone is per-frame (1x1 convs, BN,
the SE gate's per-frame spatial pool), so long clips scale across devices
with halo traffic of O(K·H·W·C) per block instead of all-gathering T.

Semantics match the unsharded ops exactly:

* forward: `ppermute` fills absent neighbors with zeros, which IS the
  global zero-padding of the reference kernels at clip boundaries.
* backward: input gradients flow through the transposed permutes; the
  (3, C) shift gradient is `psum`ed over the time axis *before* the
  per-channel L2 normalization (normalizing per-shard and then summing
  would be wrong — the reference normalizes the full-clip gradient,
  rubiks3d_kernels.cu:932-960).

Use inside `shard_map` over a mesh with a time axis; see
tests/test_temporal_parallel.py for the canonical pattern.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention_shift import attention_shift
from ..ops.shift3d import (
    DEFAULT_MAX_SHIFT, normalize_shift_grad_3d, rubiks_shift_3d,
)

TIME_AXIS = "time"


def active_time_axis(axis_name=TIME_AXIS):
    """Return `axis_name` when tracing inside a shard_map/pmap that binds it
    (i.e. the clip's T axis is sharded), else None.

    Lets the nn layers route to the halo-exchange ops automatically: the
    same model code runs unsharded or sequence-parallel depending only on
    whether the caller wrapped it in a time-axis shard_map.
    """
    try:
        lax.axis_size(axis_name)
        return axis_name
    except NameError:
        return None


def halo_exchange_time(x, k, axis_name=TIME_AXIS):
    """Extend a T-sharded (N, T_loc, H, W, C) block with its neighbors'
    boundary frames: returns (N, T_loc + 2k, H, W, C).

    Shard i receives shard i-1's last k frames on the left and shard i+1's
    first k frames on the right; the first/last shards receive zeros
    (ppermute's semantics for targets no one sends to), which reproduces the
    reference kernels' zero fill at clip boundaries.
    """
    if k == 0:
        return x
    n = lax.axis_size(axis_name)
    assert x.shape[1] >= k, (
        f"time-shard of {x.shape[1]} frames cannot source a halo of {k}; "
        f"use fewer shards or a smaller max_shift"
    )
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    left = lax.ppermute(x[:, -k:], axis_name, fwd)
    right = lax.ppermute(x[:, :k], axis_name, bwd)
    return jnp.concatenate([left, x, right], axis=1)


def _plain_sharded_shift(x, shift, k, axis_name, stride, quantize, backend,
                         max_shift):
    """Halo-extend, shift (unnormalized autodiff path), trim the halo."""
    sh, sw = stride
    xh = halo_exchange_time(x, k, axis_name)
    y = rubiks_shift_3d(
        x=xh, shift=shift, stride=(1, sh, sw), padding=0,
        normalize_grad=False, quantize=quantize, backend=backend,
        max_shift=max_shift,
    )
    return y[:, k:-k] if k else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _temporal_core(
    x, shift, axis_name, stride, normalize_grad, normalize_t_factor,
    quantize, backend, max_shift,
):
    return _plain_sharded_shift(
        x, shift, max_shift, axis_name, stride, quantize, backend, max_shift
    )


def _temporal_fwd(x, shift, axis_name, stride, normalize_grad,
                  normalize_t_factor, quantize, backend, max_shift):
    out = _plain_sharded_shift(
        x, shift, max_shift, axis_name, stride, quantize, backend, max_shift
    )
    return out, (x, shift)


def _temporal_bwd(axis_name, stride, normalize_grad, normalize_t_factor,
                  quantize, backend, max_shift, res, og):
    x, shift = res
    # Analytic per-shard grads via the unnormalized op's own VJP (recomputes
    # the cheap halo exchange; the shift op's VJP is analytic, not taped).
    _, vjp = jax.vjp(
        lambda x_, s_: _plain_sharded_shift(
            x_, s_, max_shift, axis_name, stride, quantize, backend, max_shift
        ),
        x, shift,
    )
    x_grad, shift_grad = vjp(og)
    shift_grad = lax.psum(shift_grad, axis_name)
    if normalize_grad:
        shift_grad = normalize_shift_grad_3d(
            shift_grad, float(normalize_t_factor)
        )
    # The psum marks the cotangent replicated over `axis_name`; under
    # shard_map's default check_vma=True the transpose of the replicated
    # (P()) input then adds NO further reduction over that axis (verified:
    # grads match the unsharded op exactly). check_vma=False strips that
    # tracking and shard_map psums replicated-input cotangents
    # unconditionally, double-counting ours — run this op under the default
    # check_vma=True. (A data axis in the same shard_map still accumulates
    # batch contributions as usual; those land outside this normalization —
    # for combined data+time training pass normalize_grad=False and
    # normalize after the optimizer-side reduction.)
    return x_grad, shift_grad.astype(shift.dtype)


_temporal_core.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_rubiks_shift_3d(
    x,
    shift,
    axis_name=TIME_AXIS,
    stride=1,
    normalize_grad=True,
    normalize_t_factor=1.0,
    quantize=False,
    backend="auto",
    max_shift=DEFAULT_MAX_SHIFT,
):
    """`rubiks_shift_3d` for a clip whose T axis is sharded over `axis_name`.

    Must run inside `shard_map`; `x` is the local (N, T_loc, H, W, C) block,
    `shift` the replicated (3, C) parameter. `stride` (int or (sh, sw))
    applies to H/W only
    (the model always uses temporal stride 1, models.py:132-135);
    `normalize_t_factor` is the resolved float (the "auto" => T/H rule must
    be applied by the caller with the GLOBAL T). Gradients equal the
    unsharded op's: this function psums the shift gradient across the time
    axis itself — do not add another psum for it.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    sh, sw = (int(s) for s in stride)
    return _temporal_core(
        x, shift, str(axis_name), (sh, sw), bool(normalize_grad),
        float(normalize_t_factor), bool(quantize), str(backend),
        int(max_shift),
    )


def temporal_attention_shift(x, weight, temperature=2.0, axis_name=TIME_AXIS):
    """The AQ 3-tap attention shift (ops/attention_shift.py) on a T-sharded
    block: exchange a 1-frame halo, apply the tap mix, trim.

    The tap mix itself zero-pads its window, so the halo-extended block's
    interior frames see their true neighbors and the global first/last
    frames see the zeros ppermute delivered — identical to the unsharded op.
    """
    xh = halo_exchange_time(x, 1, axis_name)
    return attention_shift(xh, weight, temperature)[:, 1:-1]


def sequence_parallel_eval(model, variables, mesh, axis_name=TIME_AXIS):
    """Build a jitted eval forward with the clip's T axis sharded over
    `mesh`'s `axis_name`.

    The nn layers detect the bound time axis (active_time_axis) and route
    every RubiksShift3D / AttentionShift through the halo-exchange ops; the
    TSN consensus becomes local-mean + pmean, so the returned logits are
    replicated. Logits equal the unsharded `model.apply(...)` up to float
    rounding (tests/test_temporal_parallel.py).

    Returns fn(video_sharded) -> (N, num_classes); shard inputs with
    `time_shard_clip(video, mesh, axis_name)`.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fwd(vars_, video):
        return model.apply(vars_, video, train=False)

    mapped = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=P(),
    )
    return jax.jit(functools.partial(mapped, variables))


def time_shard_clip(video, mesh, axis_name=TIME_AXIS):
    """Device-put a (N, T, H, W, C) clip sharded along T."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert video.shape[1] % mesh.shape[axis_name] == 0, (
        video.shape, dict(mesh.shape)
    )
    return jax.device_put(
        video, NamedSharding(mesh, P(None, axis_name))
    )

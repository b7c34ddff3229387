"""Jitted train / eval step functions.

Replaces the eager torch loops of scripts/example_finetune.py:85-137 and
scripts/test_models.py:156-190 with pure, jittable steps suitable for pjit
over a device mesh (the TPU-native equivalent of nn.DataParallel,
test_models.py:153).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def make_train_step(model, tx: optax.GradientTransformation):
    """Returns train_step(state, video, labels) -> (state, metrics).

    video: (N, T, H, W, 3); labels: (N,). BN batch stats update flows through
    the mutable collection; gradients flow through the shift ops' custom VJP
    (including the reference's per-channel gradient normalization)."""

    def loss_fn(params, batch_stats, video, labels):
        logits, updated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video,
            train=True,
            mutable=["batch_stats"],
        )
        loss = cross_entropy(logits, labels)
        return loss, (logits, updated["batch_stats"])

    def train_step(state: TrainState, video, labels):
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, video, labels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "accuracy": acc}

    return train_step


def make_eval_step(model, num_crops: int = 1, fused: bool = False,
                   normalize: Optional[Tuple] = None):
    """Returns eval_step(variables, video, labels) -> metrics dict.

    video: (N, crops, T, H, W, 3). Logits are averaged over the crops/clips
    axis inside the jitted step (the multi-view consensus of
    scripts/test_models.py:162-175). fused=True routes the forward through
    the multi-block Pallas inference executor (models/fused_infer.py).

    normalize: optional (mean, std) tuple. When given, the step accepts raw
    uint8 pixels and applies ((v/255) - mean) / std on device in f32 — the
    host then ships 4x fewer bytes than pre-normalized float32 (the
    transfer, not the compute, dominates end-to-end eval on
    bandwidth-limited host->device links).
    """
    if normalize is not None:
        mean = jnp.asarray(normalize[0], jnp.float32)
        std = jnp.asarray(normalize[1], jnp.float32)

    def eval_step(variables, video, labels):
        n, crops = video.shape[0], video.shape[1]
        flat = video.reshape((n * crops,) + video.shape[2:])
        if normalize is not None:
            flat = (flat.astype(jnp.float32) * (1.0 / 255.0) - mean) / std
        if fused:
            from ..models.fused_infer import fused_infer_apply

            logits = fused_infer_apply(model, variables, flat)
        else:
            logits = model.apply(variables, flat, train=False)
        logits = logits.reshape(n, crops, -1).mean(axis=1)
        top1 = jnp.argmax(logits, axis=-1) == labels
        k = min(5, logits.shape[-1])
        top5 = jnp.any(
            jax.lax.top_k(logits, k)[1] == labels[:, None], axis=-1
        )
        return {
            "logits": logits,
            "top1": top1.astype(jnp.float32),
            "top5": top5.astype(jnp.float32),
        }

    return eval_step


def create_train_state(bundle, tx: optax.GradientTransformation) -> TrainState:
    params = bundle.variables["params"]
    return TrainState(
        params=params,
        batch_stats=bundle.variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )

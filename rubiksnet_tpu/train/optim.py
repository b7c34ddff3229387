"""Optimizers with per-group learning-rate policies.

The reference trains shift parameters at a reduced learning rate
(get_optim_policy, rubiksnet/backbone.py:202-235: weight/bias/bn/shift groups
with lr multipliers; scripts/example_finetune.py:49-64: SGD with
lr * lr_shift_mult for params named *shift). The unit-normalized shift
gradient (see ops/shift3d.py) already lives inside the op's VJP, so the
optimizer itself stays standard.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Union

import jax
import optax


def param_labels(params) -> Any:
    """Label every leaf: 'shift' for shift parameters, 'bias' for biases and
    batch-norm scale/bias, 'weight' otherwise — mirroring the four groups of
    backbone.py:202-235 (bn and bias share the same multipliers there)."""

    def label(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if names and names[-1] == "shift":
            return "shift"
        if names and names[-1] in ("bias", "scale"):
            return "bias"
        return "weight"

    return jax.tree_util.tree_map_with_path(label, params)


def sgd_with_shift_mult(
    lr: Union[float, Callable[[Any], Any]],
    lr_shift_mult: float = 0.1,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """SGD matching scripts/example_finetune.py:49-64 / 190-208 defaults:
    momentum 0.9, weight decay 1e-4 on non-shift params, shift LR scaled by
    lr_shift_mult. Weight decay excludes shift/bias/bn groups (decay_mult=0
    in backbone.py:228-234).

    `lr` may be a float or an optax schedule (step -> lr); the per-group
    multiplier applies on top of the schedule either way."""

    def group(lr_mult, decay):
        txs = []
        if decay > 0:
            txs.append(optax.add_decayed_weights(decay))
        group_lr = (
            (lambda step: lr(step) * lr_mult) if callable(lr) else lr * lr_mult
        )
        txs.append(optax.sgd(group_lr, momentum=momentum))
        return optax.chain(*txs)

    return optax.multi_transform(
        {
            "weight": group(1.0, weight_decay),
            "bias": group(1.0, 0.0),
            "shift": group(lr_shift_mult, 0.0),
        },
        param_labels,
    )

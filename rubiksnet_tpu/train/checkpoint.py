"""Train-state checkpoint / resume.

The reference has no training resume at all (its finetune script never saves,
and its model checkpoints carry no optimizer state — rubiksnet/models.py:52-62).
This module goes beyond parity: it serializes the FULL TrainState (params, BN
batch stats, optimizer state, step counter) to the native msgpack format so a
run can resume bit-identically.

Format: msgpack dict {"format", "version", "metadata", "state"} via
flax.serialization, matching models/pretrained.py's native checkpoint style.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from .steps import TrainState

_FORMAT = "rubiksnet-tpu-trainstate"
_VERSION = 1


def save_train_state(
    path: str, state: TrainState, metadata: Optional[Dict[str, Any]] = None
) -> None:
    """Serialize a TrainState (params, batch_stats, opt_state, step).

    All leaves are fetched to host. `metadata` is an arbitrary
    msgpack-friendly dict (e.g. tier/num_classes/epoch)."""
    state = jax.device_get(state)
    payload = {
        "format": _FORMAT,
        "version": _VERSION,
        "metadata": dict(metadata or {}),
        "state": serialization.to_state_dict(state),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on interrupt


def load_train_state(
    path: str, template: TrainState
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a TrainState saved by save_train_state.

    `template` supplies the pytree structure (build it with
    create_train_state on the same model + optimizer); leaf values are
    replaced by the checkpoint's. Returns (state, metadata)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("format") != _FORMAT:
        raise ValueError(
            f"{path} is not a train-state checkpoint "
            f"(format={payload.get('format')!r})"
        )
    if payload.get("version", 0) > _VERSION:
        raise ValueError(
            f"{path} was written by a newer version "
            f"({payload['version']} > {_VERSION})"
        )
    state = serialization.from_state_dict(template, payload["state"])
    return state, dict(payload.get("metadata", {}))

"""Checkpoint I/O.

Two formats:
  * Reference-compatible: the .pth.tar dict
    ``{tier, num_classes, num_frames, variant, model: state_dict}``
    (rubiksnet/models.py:52-62), loaded with torch (CPU) and converted to
    flax params/batch_stats trees (OIHW -> HWIO kernels, (out,in) -> (in,out)
    dense kernels, BN weight/bias -> scale/bias + running stats).
  * Native: msgpack via flax.serialization, same metadata dict.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import FrozenDict

from .rubiksnet import RubiksNet, RubiksNetBundle, create_rubiksnet

__all__ = [
    "load_pretrained",
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "save_checkpoint",
    "load_checkpoint",
]


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(state_dict: Dict[str, Any], variant: str):
    """Convert a reference RubiksNet torch state_dict (numpy values accepted)
    into (params, batch_stats) nested dicts matching our flax module tree.

    Key layout documented from the reference modules:
      backbone.layerI.B.{bn1,conv2,bn2,as3,se,conv3,shortcut}.* with
      as3.rubiks3d.shift for the rubiks3d variant (models.py:84-88,128-137)
      and conv2 = Sequential(AttentionShift, Conv) for rubiks3d-aq
      (models.py:74-79), i.e. conv2.0.weight = attention (C, 3),
      conv2.1.weight = the 1x1 conv.
    """
    params: Dict = {}
    stats: Dict = {}

    def as_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        v = as_np(value)

        # Merge "layerI.B" into the flax module name "layerI_B".
        norm = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
                norm.append(f"{p}_{parts[i + 1]}")
                i += 2
            else:
                norm.append(p)
                i += 1
        parts = norm

        # AQ variant: conv2 is Sequential(AttentionShift, Conv1x1).
        if variant == "rubiks3d-aq" and "conv2" in parts:
            j = parts.index("conv2")
            if j + 1 < len(parts) and parts[j + 1] in ("0", "1"):
                if parts[j + 1] == "0":
                    if parts[-1] == "T":  # fixed temperature, not a tensor we use
                        continue
                    _set(params, tuple(parts[:j]) + ("aq_shift", "weight"), jnp.asarray(v))
                    continue
                parts = parts[: j + 1] + parts[j + 2 :]

        # SELayer: se.fc.0 / se.fc.2 -> se/fc1, se/fc2.
        if "se" in parts and "fc" in parts:
            j = parts.index("fc")
            idx = parts[j + 1]
            fc_name = {"0": "fc1", "2": "fc2"}[idx]
            parts = parts[:j] + [fc_name] + parts[j + 2 :]

        leaf = parts[-1]
        base = tuple(parts[:-1])

        if leaf == "shift":
            _set(params, base + ("shift",), jnp.asarray(v))
        elif leaf == "weight":
            if v.ndim == 4:  # conv OIHW -> HWIO
                _set(params, base + ("kernel",), jnp.asarray(v.transpose(2, 3, 1, 0)))
            elif v.ndim == 2:  # linear (out,in) -> (in,out)
                _set(params, base + ("kernel",), jnp.asarray(v.T))
            elif v.ndim == 1:  # batch norm scale
                _set(params, base + ("scale",), jnp.asarray(v))
            else:
                raise ValueError(f"unexpected weight shape {v.shape} at {key}")
        elif leaf == "bias":
            _set(params, base + ("bias",), jnp.asarray(v))
        elif leaf == "running_mean":
            _set(stats, base + ("mean",), jnp.asarray(v))
        elif leaf == "running_var":
            _set(stats, base + ("var",), jnp.asarray(v))
        else:
            raise ValueError(f"unhandled checkpoint key: {key}")

    return params, stats


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _check_compatible(target, converted, what):
    tpaths = {p: np.shape(v) for p, v in _tree_paths(target)}
    cpaths = {p: np.shape(v) for p, v in _tree_paths(converted)}
    missing = set(tpaths) - set(cpaths)
    extra = set(cpaths) - set(tpaths)
    if missing or extra:
        raise ValueError(
            f"{what} tree mismatch.\n  missing: {sorted(missing)[:8]}\n"
            f"  unexpected: {sorted(extra)[:8]}"
        )
    for p in tpaths:
        if tpaths[p] != cpaths[p]:
            raise ValueError(f"{what} shape mismatch at {p}: {tpaths[p]} vs {cpaths[p]}")


def _max_int_shift(params) -> int:
    """Smallest static bound covering every shift parameter's integer part.

    The fast forward backends (conv/select/pallas) carry a static
    |floor(shift)| <= max_shift bound; at checkpoint-load time the shift
    values are concrete, so we size the bound exactly (smaller bound =>
    smaller tap windows => faster shifts)."""
    bound = 1
    for path, leaf in _tree_paths(params):
        if path and path[-1] == "shift":
            m = float(np.max(np.abs(np.asarray(leaf))))
            bound = max(bound, int(np.floor(m)) + 1)
    return bound


def load_pretrained(
    ckpt_path: str, dtype=jnp.float32, shift_backend: str = "conv"
) -> RubiksNetBundle:
    """Load a reference .pth.tar checkpoint (models.py:52-62) or a native
    msgpack checkpoint, returning a ready-to-run bundle.

    The shift backend defaults to the fast conv formulation with the
    max-shift bound sized from the checkpoint's actual shift values."""
    ckpt_path = os.path.expanduser(ckpt_path)
    if ckpt_path.endswith((".msgpack", ".rubiks")):
        return load_checkpoint(ckpt_path, dtype=dtype, shift_backend=shift_backend)
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    params, stats = convert_torch_state_dict(ckpt["model"], ckpt["variant"])
    bundle = create_rubiksnet(
        tier=ckpt["tier"],
        num_classes=ckpt["num_classes"],
        num_frames=ckpt["num_frames"],
        variant=ckpt["variant"],
        dtype=dtype,
        shift_backend=shift_backend,
        shift_max_shift=_max_int_shift(params),
    )
    _check_compatible(serialization.to_state_dict(bundle.variables["params"]), params, "params")
    if "batch_stats" in bundle.variables:
        _check_compatible(
            serialization.to_state_dict(bundle.variables["batch_stats"]), stats,
            "batch_stats",
        )
    variables = FrozenDict({"params": params, "batch_stats": stats})
    return RubiksNetBundle(model=bundle.model, variables=variables)


def export_torch_state_dict(bundle: RubiksNetBundle) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: emit a dict with the reference's
    torch key names and tensor layouts (OIHW convs, (out,in) linears). Useful
    for cross-framework checks and for serving our checkpoints to reference
    users."""
    variant = bundle.model.variant
    out: Dict[str, np.ndarray] = {}
    params = serialization.to_state_dict(bundle.variables["params"])
    stats = serialization.to_state_dict(bundle.variables.get("batch_stats", {}))

    def emit(tree, stat_tree, prefix):
        for name, v in tree.items():
            tkey = name
            sub_stats = stat_tree.get(name, {}) if isinstance(stat_tree, dict) else {}
            if isinstance(v, dict):
                # flax module name layerI_B -> torch layerI.B
                if name.startswith("layer") and "_" in name:
                    stage, block = name.split("_", 1)
                    tkey = f"{stage}.{block}"
                if name == "aq_shift":
                    out[prefix + "conv2.0.weight"] = np.asarray(v["weight"])
                    out[prefix + "conv2.0.T"] = np.asarray(2.0, np.float32)
                    continue
                if name == "conv2" and variant == "rubiks3d-aq" and "layer" in prefix:
                    # inside a block: the conv half of the Sequential
                    out[prefix + "conv2.1.weight"] = np.asarray(
                        v["kernel"]
                    ).transpose(3, 2, 0, 1)
                    continue
                if name == "se":
                    fc = v
                    out[prefix + "se.fc.0.weight"] = np.asarray(fc["fc1"]["kernel"]).T
                    out[prefix + "se.fc.2.weight"] = np.asarray(fc["fc2"]["kernel"]).T
                    continue
                emit(v, sub_stats, prefix + tkey + ".")
            else:
                if name == "kernel":
                    arr = np.asarray(v)
                    if arr.ndim == 4:
                        out[prefix + "weight"] = arr.transpose(3, 2, 0, 1)
                    else:
                        out[prefix + "weight"] = arr.T
                elif name == "scale":
                    out[prefix + "weight"] = np.asarray(v)
                elif name in ("bias", "shift"):
                    out[prefix + name] = np.asarray(v)
                else:
                    raise ValueError(f"unexpected leaf {prefix}{name}")

    emit(params, stats, "")

    def emit_stats(tree, prefix):
        for name, v in tree.items():
            tkey = name
            if isinstance(v, dict):
                if name.startswith("layer") and "_" in name:
                    stage, block = name.split("_", 1)
                    tkey = f"{stage}.{block}"
                emit_stats(v, prefix + tkey + ".")
            else:
                if name == "mean":
                    out[prefix + "running_mean"] = np.asarray(v)
                elif name == "var":
                    out[prefix + "running_var"] = np.asarray(v)
                    out[prefix + "num_batches_tracked"] = np.asarray(0, np.int64)

    emit_stats(stats, "")
    return out


def save_checkpoint(bundle: RubiksNetBundle, path: str):
    """Native checkpoint: metadata + variables, msgpack-serialized."""
    payload = {
        "tier": bundle.model.tier,
        "num_classes": bundle.model.num_classes,
        "num_frames": bundle.model.num_frames,
        "variant": bundle.model.variant,
        "variables": serialization.to_state_dict(bundle.variables),
    }
    data = serialization.msgpack_serialize(payload)
    with open(os.path.expanduser(path), "wb") as f:
        f.write(data)


def load_checkpoint(
    path: str, dtype=jnp.float32, shift_backend: str = "conv"
) -> RubiksNetBundle:
    with open(os.path.expanduser(path), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    bundle = create_rubiksnet(
        tier=payload["tier"],
        num_classes=int(payload["num_classes"]),
        num_frames=int(payload["num_frames"]),
        variant=payload["variant"],
        dtype=dtype,
        shift_backend=shift_backend,
        shift_max_shift=_max_int_shift(payload["variables"].get("params", {})),
    )
    variables = serialization.from_state_dict(bundle.variables, payload["variables"])
    return RubiksNetBundle(model=bundle.model, variables=variables)

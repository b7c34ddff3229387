"""Variable-layout conversion between the canonical per-block ("unrolled")
parameter tree and the scanned-stage layout of
RubiksNetBackbone(scan_blocks=True).

Canonical (what checkpoints, the .pth.tar converter and the fused inference
executor use):
    backbone/layer{s}_{b}/...         one subtree per block

Scanned (what the lax.scan training graph uses; ~6x smaller serialized HLO):
    backbone/layer{s}_0/...           stage entry block, unchanged
    backbone/layer{s}_scan/block/...  blocks 1..r-1 stacked on a leading axis

Both directions are pure leaf stack/unstack — the weights are identical and
the two layouts produce bit-identical outputs (tests/test_scan_blocks.py).
This is the checkpoint shim that lets converted reference `.pth.tar` trees
(models/pretrained.py) train under scan: load canonical, `bundle_to_scanned`,
train, `bundle_to_unrolled`, save canonical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.core import FrozenDict, unfreeze

from .rubiksnet import TIERS


def _stage_repeats(tier: str):
    """Per-stage block counts in backbone order ([1, r0, r1, r2, r3])."""
    repeats = TIERS[tier][1]
    return [1, *repeats]


def variables_to_scanned(variables, tier: str):
    """Stack layer{s}_1..layer{s}_{r-1} under layer{s}_scan/block."""
    variables = unfreeze(variables)
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        bb = dict(tree.get("backbone", {}))
        for s, repeat in enumerate(_stage_repeats(tier)):
            if repeat <= 1:
                continue
            names = [f"layer{s}_{b}" for b in range(1, repeat)]
            if not all(n in bb for n in names):
                if f"layer{s}_scan" in bb:  # already scanned
                    continue
                raise ValueError(
                    f"{col}: missing block subtrees for stage {s} "
                    f"(expected {names})"
                )
            subtrees = [bb.pop(n) for n in names]
            bb[f"layer{s}_scan"] = {
                "block": jax.tree_util.tree_map(
                    lambda *leaves: jnp.stack(leaves), *subtrees
                )
            }
        if "backbone" in tree:
            tree["backbone"] = bb
        out[col] = tree
    return out


def variables_to_unrolled(variables, tier: str):
    """Split each layer{s}_scan/block stack back into per-block subtrees."""
    variables = unfreeze(variables)
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        bb = dict(tree.get("backbone", {}))
        for s, repeat in enumerate(_stage_repeats(tier)):
            key = f"layer{s}_scan"
            if key not in bb:
                continue
            stacked = bb.pop(key)["block"]
            for b in range(1, repeat):
                bb[f"layer{s}_{b}"] = jax.tree_util.tree_map(
                    lambda leaf, i=b - 1: leaf[i], stacked
                )
        if "backbone" in tree:
            tree["backbone"] = bb
        out[col] = tree
    return out


def bundle_to_scanned(bundle):
    """RubiksNetBundle in canonical layout -> scanned layout (same weights)."""
    if bundle.model.scan_blocks:
        return bundle
    model = bundle.model.clone(scan_blocks=True)
    return type(bundle)(
        model=model,
        variables=FrozenDict(
            variables_to_scanned(bundle.variables, bundle.model.tier)
        ),
    )


def bundle_to_unrolled(bundle):
    """Inverse of bundle_to_scanned."""
    if not bundle.model.scan_blocks:
        return bundle
    model = bundle.model.clone(scan_blocks=False)
    return type(bundle)(
        model=model,
        variables=FrozenDict(
            variables_to_unrolled(bundle.variables, bundle.model.tier)
        ),
    )

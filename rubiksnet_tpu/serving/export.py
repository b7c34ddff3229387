"""Ahead-of-time model export for serving.

The reference has no deployment story beyond "import torch and load the
checkpoint" (/root/reference/rubiksnet/models.py:52-62). The TPU-native
equivalent is `jax.export`: trace + lower the jitted eval forward once,
serialize the StableHLO artifact, and serve it from any process — no model
code, no Python weights, no tracing at load time. The weights are baked into
the artifact as constants, so one file is the whole deployable unit
(the same role a torch TorchScript/SavedModel bundle plays).

Artifacts are portable across processes and jax versions within the
StableHLO compatibility window; the serving host just calls
`load_exported(path)` and gets back a callable.

Batch size is fixed at export time by default (static shapes are what XLA
compiles best on TPU); pass `polymorphic_batch=True` to export a
symbolic-batch artifact instead (one trace serves any batch size, at the
cost of less shape-specialized code).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jex


def export_eval_fn(
    bundle,
    batch_size: int,
    num_crops: int = 1,
    input_size: int = 224,
    fused: bool = False,
    dtype=jnp.float32,
    polymorphic_batch: bool = False,
    platforms: Optional[list] = None,
):
    """Export the multi-view eval forward as a self-contained artifact.

    Args:
      bundle: a RubiksNetBundle (model + variables).
      batch_size: clips per call (ignored for shape when polymorphic).
      num_crops: spatial/temporal views per clip; logits are averaged over
        them inside the artifact (the consensus of
        /root/reference/scripts/test_models.py:162-175).
      input_size: spatial crop size the server will feed (the model is fully
        convolutional; 224 is the reference protocol).
      fused: route through the fused multi-block Pallas executor. TPU-only
        artifact (the kernels lower to tpu custom calls); leave False for a
        portable XLA-only artifact.
      dtype: input dtype the server will feed (activations follow the
        bundle's own dtype policy internally).
      polymorphic_batch: export with a symbolic batch dimension.
      platforms: lowering platforms, e.g. ["tpu", "cpu"]. Defaults to the
        current backend.

    Returns a jax.export.Exported; serialize with save_exported.
    """
    model = bundle.model
    variables = jax.device_get(dict(bundle.variables))
    t = model.num_frames
    size = input_size

    def forward(video):
        n, crops = video.shape[0], video.shape[1]
        flat = video.reshape((n * crops,) + video.shape[2:])
        if fused:
            from ..models.fused_infer import fused_infer_apply

            logits = fused_infer_apply(model, variables, flat)
        else:
            logits = model.apply(variables, flat, train=False)
        return logits.reshape(n, crops, -1).mean(axis=1)

    if polymorphic_batch:
        spec = jex.symbolic_args_specs(
            jax.ShapeDtypeStruct(
                (batch_size, num_crops, t, size, size, 3), dtype
            ),
            "n, _, _, _, _, _",
        )
    else:
        spec = jax.ShapeDtypeStruct(
            (batch_size, num_crops, t, size, size, 3), dtype
        )
    return jex.export(jax.jit(forward), platforms=platforms)(spec)


def save_exported(path: str, exported) -> None:
    """Serialize an Exported to disk (atomic write)."""
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_exported(path: str):
    """Load a serialized artifact; returns a jax.export.Exported whose
    `.call(video)` runs the model."""
    with open(path, "rb") as f:
        return jex.deserialize(f.read())


def run_exported(exported, video):
    """Invoke a (de)serialized artifact under jit (compiles on first call,
    cached after)."""
    return jax.jit(exported.call)(video)

"""Synthetic-overfit trainability check (SURVEY §4c).

The reference's de-facto end-to-end gradient test is example_finetune.py
overfitting a dataset whose frames encode the label as mean brightness
(reference example_finetune.py:158-172, README.md:104-106). Same idea here,
shrunk to CI size: a tiny model must fit label-correlated clips within a
few dozen SGD steps — exercising the full custom-VJP gradient path
(normalized shift gradients, BN stats, shift-lr groups) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rubiksnet_tpu.models import create_rubiksnet
from rubiksnet_tpu.train import (
    create_train_state,
    make_train_step,
    sgd_with_shift_mult,
)


@pytest.mark.slow
def test_synthetic_overfit():
    num_classes, batch, size, frames = 4, 8, 32, 4
    bundle = create_rubiksnet(
        "tiny", num_classes=num_classes, num_frames=frames, input_size=size,
    )
    tx = sgd_with_shift_mult(lr=0.05, lr_shift_mult=0.1)
    state = create_train_state(bundle, tx)
    step = jax.jit(make_train_step(bundle.model, tx))

    rng = np.random.RandomState(0)
    labels_np = np.arange(batch) % num_classes
    # Brightness encodes the label (plus per-pixel noise), one fixed batch.
    video = jnp.asarray(
        labels_np[:, None, None, None, None] / num_classes
        + 0.1 * rng.randn(batch, frames, size, size, 3),
        jnp.float32,
    )
    labels = jnp.asarray(labels_np, jnp.int32)

    first = None
    for i in range(40):
        state, metrics = step(state, video, labels)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    # Full overfit: the fixed batch should be learned nearly perfectly.
    assert last < 0.5 * first, (first, last)
    assert float(metrics["accuracy"]) >= 0.75, metrics

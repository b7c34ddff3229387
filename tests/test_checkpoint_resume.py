"""Train-state checkpoint/resume: saving at step k and resuming must continue
bit-identically with an uninterrupted run (params, BN stats, optimizer state,
step counter all restored). Beyond-reference capability: the reference's
finetune script never saves and its checkpoints carry no optimizer state
(rubiksnet/models.py:52-62, scripts/example_finetune.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rubiksnet_tpu.models import create_rubiksnet
from rubiksnet_tpu.train import (
    create_train_state,
    load_train_state,
    make_train_step,
    save_train_state,
    sgd_with_shift_mult,
)



# Model-scale tests: excluded from the fast pre-commit loop (-m "not slow").
pytestmark = pytest.mark.slow

def _setup():
    bundle = create_rubiksnet("tiny", num_classes=3, num_frames=2, input_size=32)
    tx = sgd_with_shift_mult(1e-2, 0.1)
    state = create_train_state(bundle, tx)
    step = jax.jit(make_train_step(bundle.model, tx))
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(2, 2, 32, 32, 3), jnp.float32)
    labels = jnp.asarray([0, 2], jnp.int32)
    return bundle, tx, state, step, video, labels


def test_save_load_resume_bit_identical(tmp_path):
    bundle, tx, state, step, video, labels = _setup()

    # Uninterrupted: 4 steps.
    s = state
    for _ in range(4):
        s, _ = step(s, video, labels)
    ref = jax.device_get(s)

    # Interrupted: 2 steps, save, reload into a fresh template, 2 more.
    s2 = state
    for _ in range(2):
        s2, _ = step(s2, video, labels)
    path = str(tmp_path / "ckpt.msgpack")
    save_train_state(path, s2, metadata={"epoch": 1, "tier": "tiny"})

    template = create_train_state(bundle, tx)  # fresh structure, init values
    restored, meta = load_train_state(path, template)
    assert meta == {"epoch": 1, "tier": "tiny"}
    assert int(restored.step) == 2
    for _ in range(2):
        restored, _ = step(restored, video, labels)
    got = jax.device_get(restored)

    assert int(got.step) == int(ref.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_wrong_format(tmp_path):
    from flax import serialization

    path = str(tmp_path / "bad.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize({"format": "other"}))
    bundle, tx, state, *_ = _setup()
    try:
        load_train_state(path, state)
    except ValueError as e:
        assert "not a train-state checkpoint" in str(e)
    else:
        raise AssertionError("expected ValueError")

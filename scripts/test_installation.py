"""Install smoke test: build RubiksNet-Large with random weights and run one
forward pass on a random clip (mirrors scripts/test_installation.py:1-13 of
the reference, on whatever device JAX provides — TPU or CPU)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rubiksnet_tpu.utils.platform import select_platform

select_platform()

import numpy as np
import jax
import jax.numpy as jnp

from rubiksnet_tpu.models import create_rubiksnet

num_frames = 8

print(f"=> devices: {jax.devices()}")
net = create_rubiksnet("large", num_classes=42, num_frames=num_frames)

video = jnp.asarray(
    np.random.RandomState(0).randn(2, num_frames, 224, 224, 3), jnp.float32
)
prediction = net(video)

print("Random prediction:", np.asarray(prediction))
print("Installation successful!")

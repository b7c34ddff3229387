"""rubiksnet_tpu: a TPU-native (JAX/XLA/Pallas) framework providing the full
capabilities of StanfordVL/RubiksNet — efficient video action recognition with
learnable fractional 3D shifts — redesigned for TPU hardware.

Layout convention: channel-last video tensors (N, T, H, W, C) so the channel
dimension maps onto TPU vector lanes (the reference uses (N, T, C, H, W)).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401

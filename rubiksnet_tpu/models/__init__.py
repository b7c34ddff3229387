from .rubiksnet import (
    INPUT_MEAN,
    INPUT_SIZE,
    INPUT_STD,
    TIERS,
    VARIANTS,
    RubiksNet,
    RubiksNetBundle,
    create_rubiksnet,
    from_ntchw,
)
from .pretrained import load_pretrained, save_checkpoint, load_checkpoint

__all__ = [
    "RubiksNet",
    "RubiksNetBundle",
    "create_rubiksnet",
    "from_ntchw",
    "load_pretrained",
    "save_checkpoint",
    "load_checkpoint",
    "TIERS",
    "VARIANTS",
    "INPUT_MEAN",
    "INPUT_STD",
    "INPUT_SIZE",
]

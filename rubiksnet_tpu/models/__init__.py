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
from .pretrained import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_checkpoint,
    load_pretrained,
    save_checkpoint,
)

__all__ = [
    "RubiksNet",
    "RubiksNetBundle",
    "create_rubiksnet",
    "from_ntchw",
    "load_pretrained",
    "save_checkpoint",
    "load_checkpoint",
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "TIERS",
    "VARIANTS",
    "INPUT_MEAN",
    "INPUT_STD",
    "INPUT_SIZE",
]

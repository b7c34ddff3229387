from .layers import (
    AttentionShift,
    Rubiks3DWrap,
    RubiksShift2D,
    RubiksShift3D,
    SELayer,
    group_shift_init,
    uniform_shift_init,
)
from .backbone import RubiksNetBackbone, RubiksShiftBlock

__all__ = [
    "AttentionShift",
    "Rubiks3DWrap",
    "RubiksShift2D",
    "RubiksShift3D",
    "SELayer",
    "RubiksNetBackbone",
    "RubiksShiftBlock",
    "group_shift_init",
    "uniform_shift_init",
]

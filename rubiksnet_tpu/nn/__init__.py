from .layers import (
    AttentionShift,
    Rubiks3DWrap,
    RubiksShift2D,
    RubiksShift3D,
    SELayer,
    group_shift_init,
    uniform_shift_init,
    init_shift1d_nfold,
    create_3d_from_2d,
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
    "init_shift1d_nfold",
    "create_3d_from_2d",
]

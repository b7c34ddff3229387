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
from .pooling import (
    SelectAdaptivePool2d,
    adaptive_avg_pool2d,
    adaptive_avgmax_pool2d,
    adaptive_catavgmax_pool2d,
    adaptive_max_pool2d,
    select_adaptive_pool2d,
)

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
    "SelectAdaptivePool2d",
    "adaptive_avg_pool2d",
    "adaptive_avgmax_pool2d",
    "adaptive_catavgmax_pool2d",
    "adaptive_max_pool2d",
    "select_adaptive_pool2d",
]

from .fused_shift3d import fused_shift3d_supported, rubiks_shift_3d_fused

__all__ = ["fused_shift3d_supported", "rubiks_shift_3d_fused"]

from .shift2d import (
    compute_output_shape_2d,
    normalize_shift_grad_2d,
    rubiks_shift_2d,
    rubiks_shift_2d_forward,
    rubiks_shift_2d_input_grad,
    rubiks_shift_2d_shift_grad,
)
from .shift3d import (
    compute_output_shape_3d,
    normalize_shift_grad_3d,
    rubiks_shift_3d,
    rubiks_shift_3d_forward,
    rubiks_shift_3d_input_grad,
    rubiks_shift_3d_shift_grad,
)
from .attention_shift import attention_shift

__all__ = [
    "rubiks_shift_2d",
    "rubiks_shift_2d_forward",
    "rubiks_shift_2d_input_grad",
    "rubiks_shift_2d_shift_grad",
    "rubiks_shift_3d",
    "rubiks_shift_3d_forward",
    "rubiks_shift_3d_input_grad",
    "rubiks_shift_3d_shift_grad",
    "normalize_shift_grad_2d",
    "normalize_shift_grad_3d",
    "compute_output_shape_2d",
    "compute_output_shape_3d",
    "attention_shift",
]

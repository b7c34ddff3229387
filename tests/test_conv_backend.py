"""The depthwise-conv fast path must match the gather backend exactly
(within float tolerance) whenever |floor(shift)| <= max_shift."""

import numpy as np
import pytest
import jax.numpy as jnp

from rubiksnet_tpu.ops import shift2d, shift3d

RNG = np.random.RandomState(7)

CASES_3D = [
    dict(stride=(1, 1, 1), padding=(0, 0, 0), quantize=False),
    dict(stride=(1, 2, 2), padding=(0, 0, 0), quantize=False),
    dict(stride=(2, 2, 2), padding=(1, 1, 1), quantize=False),
    dict(stride=(1, 1, 1), padding=(0, 0, 0), quantize=True),
    dict(stride=(1, 2, 2), padding=(0, 1, 0), quantize=True),
]


@pytest.mark.parametrize("case", CASES_3D)
def test_conv_backend_matches_gather_3d(case):
    x = jnp.asarray(RNG.randn(2, 4, 6, 7, 8), jnp.float64)
    shift = jnp.asarray(RNG.uniform(-3.5, 3.5, (3, 8)), jnp.float64)
    ref = shift3d.rubiks_shift_3d_forward(
        x, shift, case["stride"], case["padding"], case["quantize"], "gather"
    )
    got = shift3d.rubiks_shift_3d_forward(
        x, shift, case["stride"], case["padding"], case["quantize"], "conv", 4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12)


def test_conv_backend_integer_shifts_3d():
    x = jnp.asarray(RNG.randn(1, 4, 5, 5, 6), jnp.float64)
    shift = jnp.asarray(
        np.array([[1.0, -1.0, 0.0, 2.0, -2.0, 4.0]] * 3), jnp.float64
    )
    ref = shift3d.rubiks_shift_3d_forward(x, shift)
    got = shift3d.rubiks_shift_3d_forward(x, shift, backend="conv")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_conv_backend_matches_gather_2d():
    x = jnp.asarray(RNG.randn(2, 6, 7, 8), jnp.float64)
    shift = jnp.asarray(RNG.uniform(-3.5, 3.5, (2, 8)), jnp.float64)
    for stride, padding in [((1, 1), (0, 0)), ((2, 2), (0, 0)), ((2, 1), (1, 0))]:
        ref = shift2d.rubiks_shift_2d_forward(x, shift, stride, padding, False)
        got = shift2d.rubiks_shift_2d_forward(
            x, shift, stride, padding, False, "conv", 4
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12
        )


def test_conv_backend_vjp_matches():
    """Backend choice must not change gradients (the VJP math is shared)."""
    import jax

    x = jnp.asarray(RNG.randn(1, 3, 5, 5, 4), jnp.float64)
    shift = jnp.asarray(RNG.uniform(-1, 1, (3, 4)), jnp.float64)

    def loss(backend):
        def f(xv, sv):
            return jnp.sum(
                shift3d.rubiks_shift_3d(xv, sv, backend=backend) ** 2
            )
        return jax.grad(f, argnums=(0, 1))(x, shift)

    gx_g, gs_g = loss("gather")
    gx_c, gs_c = loss("conv")
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gs_c), np.asarray(gs_g), atol=1e-12)


@pytest.mark.parametrize("case", CASES_3D)
def test_select_inverse_shift_matches_gather(case):
    """The dilated select-unroll input gradient must match the gather path."""
    from rubiksnet_tpu.ops.shift3d import (
        compute_output_shape_3d,
        rubiks_shift_3d_input_grad,
    )

    in_shape = (2, 4, 6, 7, 8)
    out_shape = compute_output_shape_3d(in_shape, case["stride"], case["padding"])
    og = jnp.asarray(RNG.randn(*out_shape), jnp.float64)
    shift = jnp.asarray(RNG.uniform(-3.5, 3.5, (3, 8)), jnp.float64)
    ref = rubiks_shift_3d_input_grad(
        og, shift, in_shape, case["stride"], case["padding"], case["quantize"],
        "gather",
    )
    got = rubiks_shift_3d_input_grad(
        og, shift, in_shape, case["stride"], case["padding"], case["quantize"],
        "select", 4,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


@pytest.mark.parametrize("case", CASES_3D[:3])
def test_select_shift_grad_matches_gather(case):
    """The select-backend corrected-tap shift gradient must match gather."""
    from rubiksnet_tpu.ops.shift3d import (
        compute_output_shape_3d,
        rubiks_shift_3d_shift_grad,
    )

    in_shape = (2, 4, 6, 7, 8)
    x = jnp.asarray(RNG.randn(*in_shape), jnp.float64)
    out_shape = compute_output_shape_3d(in_shape, case["stride"], case["padding"])
    og = jnp.asarray(RNG.randn(*out_shape), jnp.float64)
    shift = np.asarray(RNG.uniform(-3.5, 3.5, (3, 8)))
    shift[:, 0] = [1.0, -1.0, 0.0]  # integer shifts: corrected-corner path
    shift = jnp.asarray(shift)
    ref = rubiks_shift_3d_shift_grad(
        og, x, shift, case["stride"], case["padding"], "gather"
    )
    got = rubiks_shift_3d_shift_grad(
        og, x, shift, case["stride"], case["padding"], "select", 4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_select_shift_grad_2d_matches_gather():
    from rubiksnet_tpu.ops.shift2d import (
        compute_output_shape_2d,
        rubiks_shift_2d_shift_grad,
    )

    in_shape = (2, 6, 7, 8)
    x = jnp.asarray(RNG.randn(*in_shape), jnp.float64)
    for stride, padding in [((1, 1), (0, 0)), ((2, 2), (0, 0)), ((2, 1), (1, 0))]:
        out_shape = compute_output_shape_2d(in_shape, stride, padding)
        og = jnp.asarray(RNG.randn(*out_shape), jnp.float64)
        shift = np.asarray(RNG.uniform(-3.5, 3.5, (2, 8)))
        shift[:, 0] = [1.0, -2.0]
        shift = jnp.asarray(shift)
        ref = rubiks_shift_2d_shift_grad(og, x, shift, stride, padding, "gather")
        got = rubiks_shift_2d_shift_grad(og, x, shift, stride, padding, "select", 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-10)

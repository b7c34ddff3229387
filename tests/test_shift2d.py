"""Golden tests for the 2D shift op vs. the numpy oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle
from rubiksnet_tpu.ops import shift2d

RNG = np.random.RandomState(1)


def _mk(n=2, c=6, h=6, w=7, shift_scale=1.5, dtype=np.float64):
    x = RNG.randn(n, c, h, w).astype(dtype)
    shift = (RNG.uniform(-1, 1, size=(2, c)) * shift_scale).astype(dtype)
    return x, shift


def _to_cl(x):  # NCHW -> NHWC
    return np.transpose(x, (0, 2, 3, 1))


def _from_cl(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


CASES = [
    dict(stride=(1, 1), padding=(0, 0), quantize=False),
    dict(stride=(2, 2), padding=(0, 0), quantize=False),
    dict(stride=(2, 1), padding=(1, 0), quantize=False),
    dict(stride=(1, 1), padding=(0, 0), quantize=True),
    dict(stride=(2, 2), padding=(0, 0), quantize=True),
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_oracle(case):
    x, shift = _mk()
    ref = oracle.shift2d_forward(x, shift, case["stride"], case["padding"], case["quantize"])
    got = shift2d.rubiks_shift_2d_forward(
        jnp.asarray(_to_cl(x)), jnp.asarray(shift),
        case["stride"], case["padding"], case["quantize"],
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


def test_forward_quantize_negative_rounding():
    """round_fast is half-away-from-zero of (base + shift): exercises negative
    sums near the boundary (cuda_src/rubiks2d_kernels.cu:76-82)."""
    x, _ = _mk()
    shift = np.array(
        [[-0.7, -0.5, -0.3, 0.5, 1.5, -1.5]] * 2, dtype=np.float64
    )
    ref = oracle.shift2d_forward(x, shift, (1, 1), (0, 0), True)
    got = shift2d.rubiks_shift_2d_forward(
        jnp.asarray(_to_cl(x)), jnp.asarray(shift), (1, 1), (0, 0), True
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("case", CASES)
def test_input_grad_matches_oracle(case):
    x, shift = _mk()
    out_shape = shift2d.compute_output_shape_2d(
        _to_cl(x).shape, case["stride"], case["padding"]
    )
    og_cl = RNG.randn(*out_shape)
    ref = oracle.shift2d_input_grad(
        _from_cl(og_cl), x.shape, shift, case["stride"], case["padding"], case["quantize"]
    )
    got = shift2d.rubiks_shift_2d_input_grad(
        jnp.asarray(og_cl), jnp.asarray(shift), _to_cl(x).shape,
        case["stride"], case["padding"], case["quantize"],
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("case", CASES[:3])
def test_shift_grad_matches_oracle(case):
    x, shift = _mk()
    # exact integer shifts exercise the ZERO_TOL central-difference path
    shift[:, 0] = [1.0, -1.0]
    shift[0, 1] = 0.0
    shift[1, 2] = 2.0
    out_shape = shift2d.compute_output_shape_2d(
        _to_cl(x).shape, case["stride"], case["padding"]
    )
    og_cl = RNG.randn(*out_shape)
    ref = oracle.shift2d_shift_grad(
        _from_cl(og_cl), x, shift, case["stride"], case["padding"]
    )
    got = shift2d.rubiks_shift_2d_shift_grad(
        jnp.asarray(og_cl), jnp.asarray(_to_cl(x)), jnp.asarray(shift),
        case["stride"], case["padding"],
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-9, atol=1e-9)


def test_vjp_normalized_and_disabled():
    x, shift = _mk(n=1, c=4, h=5, w=5)
    xj, sj = jnp.asarray(_to_cl(x)), jnp.asarray(shift)
    out_shape = shift2d.compute_output_shape_2d(xj.shape, (1, 1), (0, 0))
    w = jnp.asarray(RNG.randn(*out_shape))

    def loss(xv, sv, enable):
        return jnp.sum(
            shift2d.rubiks_shift_2d(
                xv, sv, normalize_grad=True, enable_shift_grad=enable
            )
            * w
        )

    gx, gs = jax.grad(loss, argnums=(0, 1))(xj, sj, True)
    og = _from_cl(np.asarray(w))
    ref_gx = oracle.shift2d_input_grad(og, x.shape, shift, (1, 1), (0, 0), False)
    ref_gs = oracle.normalize_shift_grad_2d(
        oracle.shift2d_shift_grad(og, x, shift, (1, 1), (0, 0))
    )
    np.testing.assert_allclose(_from_cl(gx), ref_gx, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gs), ref_gs, rtol=1e-9, atol=1e-9)

    _, gs_off = jax.grad(loss, argnums=(0, 1))(xj, sj, False)
    np.testing.assert_allclose(np.asarray(gs_off), np.zeros_like(shift))

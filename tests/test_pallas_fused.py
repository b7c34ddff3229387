"""Fused Pallas kernel (interpret mode on CPU) vs the gather backend."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rubiksnet_tpu.ops import shift3d
from rubiksnet_tpu.ops.pallas import fused_shift3d_supported

RNG = np.random.RandomState(11)


@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2)])
@pytest.mark.parametrize("quantize", [False, True])
def test_fused_matches_gather(stride, quantize):
    x = jnp.asarray(RNG.randn(2, 4, 6, 7, 8), jnp.float32)
    shift = jnp.asarray(RNG.uniform(-3, 3, (3, 8)), jnp.float32)
    assert fused_shift3d_supported(x.shape, stride, (0, 0, 0), 4, jnp.float32)
    ref = shift3d.rubiks_shift_3d_forward(x, shift, stride, (0, 0, 0), quantize, "gather")
    got = shift3d.rubiks_shift_3d_forward(x, shift, stride, (0, 0, 0), quantize, "pallas", 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_fused_bf16():
    x = jnp.asarray(RNG.randn(1, 4, 8, 8, 72), jnp.bfloat16)
    shift = jnp.asarray(RNG.uniform(-1, 1, (3, 72)), jnp.bfloat16)
    ref = shift3d.rubiks_shift_3d_forward(x, shift, (1, 1, 1), (0, 0, 0), False, "gather")
    got = shift3d.rubiks_shift_3d_forward(x, shift, (1, 1, 1), (0, 0, 0), False, "pallas", 2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_unsupported_configs_fall_back():
    """Strided T / padded configs route to the select backend and still match
    gather."""
    x = jnp.asarray(RNG.randn(1, 6, 5, 5, 4), jnp.float64)
    shift = jnp.asarray(RNG.uniform(-1.5, 1.5, (3, 4)), jnp.float64)
    assert not fused_shift3d_supported(x.shape, (2, 2, 2), (1, 1, 1), 4, jnp.float64)
    ref = shift3d.rubiks_shift_3d_forward(x, shift, (2, 2, 2), (1, 1, 1), False, "gather")
    got = shift3d.rubiks_shift_3d_forward(x, shift, (2, 2, 2), (1, 1, 1), False, "pallas", 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_vjp_through_pallas_backend():
    """Gradients route through the shared custom VJP regardless of backend."""
    x = jnp.asarray(RNG.randn(1, 3, 5, 5, 4), jnp.float64)
    shift = jnp.asarray(RNG.uniform(-1, 1, (3, 4)), jnp.float64)

    def loss(backend, xv, sv):
        return jnp.sum(shift3d.rubiks_shift_3d(xv, sv, backend=backend) ** 2)

    gx_g, gs_g = jax.grad(lambda a, b: loss("gather", a, b), argnums=(0, 1))(x, shift)
    gx_p, gs_p = jax.grad(lambda a, b: loss("pallas", a, b), argnums=(0, 1))(x, shift)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_g), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_g), atol=1e-10)

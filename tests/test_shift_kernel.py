"""One-pass stride-1 Pallas shift kernel vs the select backend (interpret
mode on CPU), forward and inverse, plus the custom-VJP routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rubiksnet_tpu.ops import shift3d as s3d
from rubiksnet_tpu.ops.pallas.shift_kernel import (
    rubiks_shift3d_pallas,
    shift3d_pallas_supported,
)


@pytest.mark.parametrize("quantize", [False, True])
def test_forward_matches_select(quantize):
    c, k = 128, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 9, 7, c), jnp.float32)
    shift = jax.random.uniform(
        jax.random.PRNGKey(1), (3, c), jnp.float32, -1.9, 1.9
    )
    assert shift3d_pallas_supported(x.shape, (1, 1, 1), (0, 0, 0), k, x.dtype)
    got = rubiks_shift3d_pallas(x, shift, k, quantize)
    want = s3d.rubiks_shift_3d_forward(
        x, shift, backend="select", quantize=quantize, max_shift=k
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_inverse_matches_select_input_grad():
    c, k = 128, 2
    og = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 6, 6, c), jnp.float32)
    shift = jax.random.uniform(
        jax.random.PRNGKey(3), (3, c), jnp.float32, -1.5, 1.5
    )
    got = s3d.rubiks_shift_3d_input_grad(
        og, shift, og.shape, backend="pallas", max_shift=k
    )
    want = s3d.rubiks_shift_3d_input_grad(
        og, shift, og.shape, backend="select", max_shift=k
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_vjp_through_pallas_backend():
    """Full custom-VJP path with backend='pallas' vs 'select' (both grads)."""
    c, k = 128, 1
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 5, 5, c), jnp.float32)
    shift = jax.random.uniform(
        jax.random.PRNGKey(5), (3, c), jnp.float32, -0.9, 0.9
    )

    def loss(backend):
        def f(x_, s_):
            out = s3d.rubiks_shift_3d(
                x_, s_, backend=backend, max_shift=k, normalize_grad=False
            )
            return jnp.sum(out * out)
        return f

    lp, gp = jax.value_and_grad(loss("pallas"), argnums=(0, 1))(x, shift), None
    ls = jax.value_and_grad(loss("select"), argnums=(0, 1))(x, shift)
    np.testing.assert_allclose(float(lp[0]), float(ls[0]), rtol=1e-6)
    for a, b in zip(lp[1], ls[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_shift2d_pallas_backend():
    """2D shift routes through the 3D one-pass kernel (T=1, identity row)."""
    from rubiksnet_tpu.ops import shift2d as s2d

    c, k = 128, 1
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 9, c), jnp.float32)
    shift = jax.random.uniform(
        jax.random.PRNGKey(7), (2, c), jnp.float32, -1.5, 1.5
    )
    got = s2d.rubiks_shift_2d_forward(x, shift, backend="pallas", max_shift=k)
    want = s2d.rubiks_shift_2d_forward(x, shift, backend="select", max_shift=k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    gg = s2d.rubiks_shift_2d_input_grad(
        x, shift, x.shape, backend="pallas", max_shift=k
    )
    gw = s2d.rubiks_shift_2d_input_grad(
        x, shift, x.shape, backend="select", max_shift=k
    )
    np.testing.assert_allclose(
        np.asarray(gg), np.asarray(gw), rtol=1e-5, atol=1e-5
    )

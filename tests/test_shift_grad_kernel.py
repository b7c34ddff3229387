"""One-pass Pallas (3, C) shift-gradient kernel vs the XLA tap formulation
(interpret mode on CPU), including the exact-integer-shift corrected taps and
the custom-VJP 'auto'/'pallas' routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rubiksnet_tpu.ops import shift3d as s3d
from rubiksnet_tpu.ops.pallas.shift_grad_kernel import (
    corrected_tap_weights,
    rubiks_shift3d_shift_grad_pallas,
    shift_grad_pallas_supported,
)


def _case(c, k, seed=0, frac=True, dtype=jnp.float32):
    kx, ko, ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(kx, (2, 4, 6, 7, c), dtype)
    og = jax.random.normal(ko, (2, 4, 6, 7, c), dtype)
    if frac:
        shift = jax.random.uniform(ks, (3, c), jnp.float32, -k + 0.1, k - 0.1)
    else:
        # exact integers exercise the backward-difference corrected taps
        shift = jnp.round(
            jax.random.uniform(ks, (3, c), jnp.float32, -k, k)
        )
    return x, og, shift


@pytest.mark.parametrize("c,k", [(128, 1), (128, 2), (72, 1)])
@pytest.mark.parametrize("frac", [True, False])
def test_shift_grad_kernel_matches_select(c, k, frac):
    x, og, shift = _case(c, k, seed=c + k, frac=frac)
    assert shift_grad_pallas_supported(
        x.shape, og.shape, (1, 1, 1), (0, 0, 0), x.dtype, k
    )
    got = rubiks_shift3d_shift_grad_pallas(og, x, shift, k)
    want = s3d.rubiks_shift_3d_shift_grad(
        og, x, shift, backend="select", max_shift=k
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_shift_grad_kernel_mixed_int_frac():
    """Per-channel mix: some channels exactly integer, others fractional."""
    c, k = 128, 1
    x, og, shift = _case(c, k, seed=9)
    shift = shift.at[:, ::3].set(jnp.round(shift[:, ::3]))
    shift = shift.at[0, 0].set(0.0)
    shift = shift.at[1, 1].set(-1.0)
    shift = shift.at[2, 2].set(1.0)
    got = rubiks_shift3d_shift_grad_pallas(og, x, shift, k)
    want = s3d.rubiks_shift_3d_shift_grad(
        og, x, shift, backend="select", max_shift=k
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_shift_grad_backend_string_routes_to_kernel():
    """backend='pallas' on the public shift-grad entry uses the kernel for
    supported configs and falls back to select for strided ones."""
    c, k = 128, 1
    x, og, shift = _case(c, k, seed=3)
    got = s3d.rubiks_shift_3d_shift_grad(
        og, x, shift, backend="pallas", max_shift=k
    )
    want = s3d.rubiks_shift_3d_shift_grad(
        og, x, shift, backend="select", max_shift=k
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    # strided: support predicate is False; must not crash (select fallback)
    og_s = og[:, :, ::2, ::2]
    assert not shift_grad_pallas_supported(
        x.shape, og_s.shape, (1, 2, 2), (0, 1, 1), x.dtype, k
    )
    got_s = s3d.rubiks_shift_3d_shift_grad(
        og_s, x, shift, stride=(1, 2, 2), padding=(0, 1, 1),
        backend="pallas", max_shift=k,
    )
    want_s = s3d.rubiks_shift_3d_shift_grad(
        og_s, x, shift, stride=(1, 2, 2), padding=(0, 1, 1),
        backend="select", max_shift=k,
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=2e-4, atol=2e-4
    )


def test_full_vjp_with_pallas_backend_matches_gather():
    """End-to-end custom VJP (normalized grads) through backend='pallas'."""
    c, k = 128, 1
    x, og, shift = _case(c, k, seed=5)

    def loss(backend):
        def f(xv, sv):
            out = s3d.rubiks_shift_3d(
                xv, sv, backend=backend, max_shift=k
            )
            return jnp.sum(out * og)
        return jax.grad(f, argnums=(0, 1))(x, shift)

    gx_p, gs_p = loss("pallas")
    gx_g, gs_g = loss("gather")
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_g), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gs_p), np.asarray(gs_g), rtol=1e-4, atol=1e-4
    )


def test_corrected_tap_weights_structure():
    k = 1
    shift = jnp.asarray([[0.5], [1.0], [-0.25]], jnp.float32)
    tw = np.asarray(corrected_tap_weights(shift, k))
    m = k + 1
    # axis T: shift 0.5 -> lerp 0.5 @ 0, 0.5 @ +1; diff +1 @ +1, -1 @ 0
    np.testing.assert_allclose(tw[0, :, 0], [0, 0, 0.5, 0.5, 0])
    np.testing.assert_allclose(tw[1, :, 0], [0, 0, -1, 1, 0])
    # axis H: exact integer 1.0 -> corrected small at 0 with weight 1
    np.testing.assert_allclose(tw[2, :, 0], [0, 0, 1.0, 0, 0])
    np.testing.assert_allclose(tw[3, :, 0], [0, 0, -1, 0, 1])
    # axis W: -0.25 -> floor -1, r=0.75: lerp 0.25 @ -1, 0.75 @ 0
    np.testing.assert_allclose(tw[4, :, 0], [0, 0.25, 0.75, 0, 0])
    assert tw.shape == (6, 2 * m + 1, 1)

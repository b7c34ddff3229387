"""backend='auto': per-shape selection must be numerically identical to the
gather reference path for every configuration it can be asked to handle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rubiksnet_tpu.ops import shift2d, shift3d
from rubiksnet_tpu.ops.auto_backend import (
    OCCUPANCY_MIN,
    choose_forward_backend,
    choose_input_grad_backend,
    lane_occupancy,
)

RNG = np.random.RandomState(7)


def _mk3(c, shift_scale=1.4):
    x = RNG.randn(2, 4, 6, 7, c)
    shift = RNG.uniform(-1, 1, size=(3, c)) * shift_scale
    return jnp.asarray(x), jnp.asarray(shift)


@pytest.mark.parametrize("c", [6, 120])  # conv-picked and pallas-picked
@pytest.mark.parametrize(
    "stride,padding,quantize",
    [((1, 1, 1), (0, 0, 0), False),
     ((1, 2, 2), (0, 1, 0), False),
     ((1, 1, 1), (0, 0, 0), True)],
)
def test_auto_forward_matches_gather(c, stride, padding, quantize):
    x, shift = _mk3(c)
    want = shift3d.rubiks_shift_3d_forward(
        x, shift, stride, padding, quantize, backend="gather")
    got = shift3d.rubiks_shift_3d_forward(
        x, shift, stride, padding, quantize, backend="auto", max_shift=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("c", [6, 120])
def test_auto_vjp_matches_gather(c):
    x, shift = _mk3(c)

    def loss(backend):
        def f(xv, sv):
            out = shift3d.rubiks_shift_3d(
                xv, sv, backend=backend, max_shift=2)
            return jnp.sum(out * out)
        return jax.grad(f, argnums=(0, 1))(x, shift)

    gx_want, gs_want = loss("gather")
    gx_got, gs_got = loss("auto")
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs_got), np.asarray(gs_want),
                               rtol=1e-6, atol=1e-6)


def test_auto_2d_matches_gather():
    c = 120
    x = jnp.asarray(RNG.randn(2, 9, 8, c))
    shift = jnp.asarray(RNG.uniform(-1.4, 1.4, size=(2, c)))

    for quantize in (False, True):
        want = shift2d.rubiks_shift_2d_forward(
            x, shift, quantize=quantize, backend="gather")
        got = shift2d.rubiks_shift_2d_forward(
            x, shift, quantize=quantize, backend="auto", max_shift=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def f(backend):
        def loss(xv, sv):
            out = shift2d.rubiks_shift_2d(xv, sv, backend=backend, max_shift=2)
            return jnp.sum(out * out)
        return jax.grad(loss, argnums=(0, 1))(x, shift)

    (gx_w, gs_w), (gx_g, gs_g) = f("gather"), f("auto")
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs_g), np.asarray(gs_w),
                               rtol=1e-6, atol=1e-6)


def test_selection_rules():
    assert lane_occupancy(128) == 1.0
    assert lane_occupancy(144) == pytest.approx(144 / 256)
    # Round-5 measured rules (SHIFT_MICROBENCH.json, clean estimator):
    # forward -> mix everywhere, input grad -> select everywhere,
    # shift grad -> pallas at >= OCCUPANCY_MIN.
    hi = (2, 4, 6, 7, 120)
    lo = (2, 4, 6, 7, 144)
    s1, p0 = (1, 1, 1), (0, 0, 0)
    assert lane_occupancy(120) >= OCCUPANCY_MIN
    assert choose_forward_backend(hi, s1, p0, False, 2, jnp.float32) == "mix"
    assert choose_forward_backend(lo, s1, p0, False, 2, jnp.float32) == "mix"
    assert choose_forward_backend(hi, (1, 2, 2), p0, False, 2,
                                  jnp.float32) == "mix"
    assert choose_input_grad_backend(
        (2, 4, 3, 4, 120), hi, (1, 2, 2), p0, False, 2, jnp.float32
    ) == "select"
    assert choose_input_grad_backend(
        hi, hi, s1, p0, False, 2, jnp.float32) == "select"
    from rubiksnet_tpu.ops.auto_backend import choose_shift_grad_backend

    big = (2, 8, 14, 14, 288)
    assert choose_shift_grad_backend(
        big, big, s1, p0, 1, jnp.float32) == "pallas"
    assert choose_shift_grad_backend(
        lo, lo, s1, p0, 2, jnp.float32) == "select"

"""Golden tests: TPU-native separable shift ops vs. the loop-based numpy
oracle (a direct transcription of the reference CUDA kernels)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle
from rubiksnet_tpu.ops import shift3d

RNG = np.random.RandomState(0)


def _mk(n=2, t=4, c=6, h=5, w=7, shift_scale=1.5, dtype=np.float64):
    x = RNG.randn(n, t, c, h, w).astype(dtype)
    shift = (RNG.uniform(-1, 1, size=(3, c)) * shift_scale).astype(dtype)
    return x, shift


def _to_cl(x):  # NTCHW -> NTHWC
    return np.transpose(x, (0, 1, 3, 4, 2))


def _from_cl(x):
    return np.transpose(np.asarray(x), (0, 1, 4, 2, 3))


CASES = [
    dict(stride=(1, 1, 1), padding=(0, 0, 0), quantize=False),
    dict(stride=(1, 2, 2), padding=(0, 0, 0), quantize=False),
    dict(stride=(2, 2, 2), padding=(1, 1, 1), quantize=False),
    dict(stride=(1, 1, 1), padding=(0, 0, 0), quantize=True),
    dict(stride=(1, 2, 2), padding=(0, 1, 0), quantize=True),
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_oracle(case):
    x, shift = _mk()
    ref = oracle.shift3d_forward(x, shift, case["stride"], case["padding"], case["quantize"])
    got = shift3d.rubiks_shift_3d_forward(
        jnp.asarray(_to_cl(x)), jnp.asarray(shift),
        case["stride"], case["padding"], case["quantize"],
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


def test_forward_integer_shifts():
    x, _ = _mk()
    shift = np.array(
        [[1.0, -1.0, 0.0, 2.0, -2.0, 0.0]] * 3, dtype=np.float64
    )
    ref = oracle.shift3d_forward(x, shift, (1, 1, 1), (0, 0, 0), False)
    got = shift3d.rubiks_shift_3d_forward(jnp.asarray(_to_cl(x)), jnp.asarray(shift))
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


def test_forward_large_oob_shifts():
    x, _ = _mk()
    shift = RNG.uniform(-10, 10, size=(3, 6))
    ref = oracle.shift3d_forward(x, shift, (1, 1, 1), (0, 0, 0), False)
    got = shift3d.rubiks_shift_3d_forward(jnp.asarray(_to_cl(x)), jnp.asarray(shift))
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("case", CASES)
def test_input_grad_matches_oracle(case):
    x, shift = _mk()
    out_shape = shift3d.compute_output_shape_3d(
        _to_cl(x).shape, case["stride"], case["padding"]
    )
    og_cl = RNG.randn(*out_shape)
    og = _from_cl(og_cl)
    ref = oracle.shift3d_input_grad(
        og, x.shape, shift, case["stride"], case["padding"], case["quantize"]
    )
    got = shift3d.rubiks_shift_3d_input_grad(
        jnp.asarray(og_cl), jnp.asarray(shift), _to_cl(x).shape,
        case["stride"], case["padding"], case["quantize"],
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("case", CASES[:3])
def test_shift_grad_matches_oracle(case):
    x, shift = _mk()
    # include exact integer shifts to exercise the corrected-corner path
    shift[:, 0] = [1.0, -1.0, 0.0]
    shift[0, 1] = 0.0
    out_shape = shift3d.compute_output_shape_3d(
        _to_cl(x).shape, case["stride"], case["padding"]
    )
    og_cl = RNG.randn(*out_shape)
    ref = oracle.shift3d_shift_grad(
        _from_cl(og_cl), x, shift, case["stride"], case["padding"]
    )
    got = shift3d.rubiks_shift_3d_shift_grad(
        jnp.asarray(og_cl), jnp.asarray(_to_cl(x)), jnp.asarray(shift),
        case["stride"], case["padding"],
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("factor", [1.0, 0.5, 8 / 5, -1.0])
def test_normalize_shift_grad(factor):
    g = RNG.randn(3, 8)
    g[:, 3] = 0.0  # zero-magnitude channel passes through
    ref = oracle.normalize_shift_grad_3d(g, factor)
    got = shift3d.normalize_shift_grad_3d(jnp.asarray(g), factor)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12, atol=1e-12)


def test_custom_vjp_end_to_end():
    """Full VJP: x-grad via inverse shift; shift-grad normalized per channel."""
    x, shift = _mk(n=1, t=3, c=4, h=4, w=5)
    xj, sj = jnp.asarray(_to_cl(x)), jnp.asarray(shift)

    def loss(xv, sv):
        out = shift3d.rubiks_shift_3d(
            xv, sv, stride=1, padding=0,
            normalize_grad=True, normalize_t_factor=1.0,
        )
        return jnp.sum(out * weights)

    out_shape = shift3d.compute_output_shape_3d(xj.shape, (1, 1, 1), (0, 0, 0))
    weights = jnp.asarray(RNG.randn(*out_shape))

    gx, gs = jax.grad(loss, argnums=(0, 1))(xj, sj)
    og = _from_cl(np.asarray(weights))
    ref_gx = oracle.shift3d_input_grad(og, x.shape, shift, (1, 1, 1), (0, 0, 0), False)
    ref_gs = oracle.normalize_shift_grad_3d(
        oracle.shift3d_shift_grad(og, x, shift, (1, 1, 1), (0, 0, 0)), 1.0
    )
    np.testing.assert_allclose(_from_cl(gx), ref_gx, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gs), ref_gs, rtol=1e-9, atol=1e-9)


def test_unnormalized_shift_grad_is_true_derivative():
    """With normalize_grad=False and fractional (non-integer) shifts, the
    analytic shift gradient equals a central finite difference of the
    forward."""
    x, shift = _mk(n=1, t=3, c=4, h=5, w=5, shift_scale=0.7)
    # keep remainders well away from 0 so corrected corners = plain corners
    shift = np.clip(shift, -0.8, 0.8)
    shift[np.abs(shift) < 0.15] = 0.3
    xj, sj = jnp.asarray(_to_cl(x)), jnp.asarray(shift)

    def loss(sv):
        out = shift3d.rubiks_shift_3d(xj, sv, normalize_grad=False)
        return jnp.sum(out**2) / 2

    gs = jax.grad(loss)(sj)
    eps = 1e-6
    for row in range(3):
        for ci in range(4):
            sp = shift.copy()
            sp[row, ci] += eps
            sm = shift.copy()
            sm[row, ci] -= eps
            fp = float(loss(jnp.asarray(sp)))
            fm = float(loss(jnp.asarray(sm)))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(float(gs[row, ci]), fd, rtol=1e-4, atol=1e-5)


def test_auto_t_factor():
    """normalize_t_factor='auto' resolves to T/H."""
    x, shift = _mk(n=1, t=4, c=4, h=6, w=6)
    xj, sj = jnp.asarray(_to_cl(x)), jnp.asarray(shift)
    w = jnp.ones(shift3d.compute_output_shape_3d(xj.shape, (1, 1, 1), (0, 0, 0)))

    def loss(sv, factor):
        return jnp.sum(
            shift3d.rubiks_shift_3d(xj, sv, normalize_t_factor=factor) * w
        )

    g_auto = jax.grad(lambda s: loss(s, "auto"))(sj)
    g_expl = jax.grad(lambda s: loss(s, 4 / 6))(sj)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_expl))


@pytest.mark.parametrize("backend", ["mix"])
@pytest.mark.parametrize("case", CASES)
def test_forward_mix_backend_matches_oracle(case, backend):
    """'mix' (T via select slices, H/W via depthwise convs — the layout-
    neutral formulation the auto fallback ships) must equal the oracle."""
    x, shift = _mk()
    ref = oracle.shift3d_forward(
        x, shift, case["stride"], case["padding"], case["quantize"])
    got = shift3d.rubiks_shift_3d_forward(
        jnp.asarray(_to_cl(x)), jnp.asarray(shift),
        case["stride"], case["padding"], case["quantize"],
        backend=backend, max_shift=2,
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)



@pytest.mark.parametrize("case", CASES[:3])
def test_shift_grad_conv_taps_matches_oracle(case, monkeypatch):
    """The depthwise-conv corrected-tap extraction (the default for strided
    configs — the select taps' strided slices are the measured train-
    backward pathology) must match the oracle exactly."""
    monkeypatch.setenv("RUBIKS_SHIFT_GRAD_TAPS", "conv")
    x, shift = _mk()
    shift[:, 0] = [1.0, -1.0, 0.0]  # exercise corrected corners
    out_shape = shift3d.compute_output_shape_3d(
        _to_cl(x).shape, case["stride"], case["padding"]
    )
    og_cl = RNG.randn(*out_shape)
    ref = oracle.shift3d_shift_grad(
        _from_cl(og_cl), x, shift, case["stride"], case["padding"]
    )
    got = shift3d.rubiks_shift_3d_shift_grad(
        jnp.asarray(og_cl), jnp.asarray(_to_cl(x)), jnp.asarray(shift),
        case["stride"], case["padding"], backend="select",
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("case", CASES)
def test_input_grad_select_conv_taps_matches_oracle(case):
    """The select-branch input grad with the per-axis dilated-conv
    formulation on strided axes (the round-5 default) equals the oracle."""
    x, shift = _mk()
    out_shape = shift3d.compute_output_shape_3d(
        _to_cl(x).shape, case["stride"], case["padding"]
    )
    og_cl = RNG.randn(*out_shape)
    ref = oracle.shift3d_input_grad(
        _from_cl(og_cl), x.shape, shift, case["stride"], case["padding"],
        case["quantize"]
    )
    got = shift3d.rubiks_shift_3d_input_grad(
        jnp.asarray(og_cl), jnp.asarray(shift), _to_cl(x).shape,
        case["stride"], case["padding"], case["quantize"], backend="select",
        max_shift=2,
    )
    np.testing.assert_allclose(_from_cl(got), ref, rtol=1e-12, atol=1e-12)

"""Sequence (temporal) parallelism: halo-exchange shift == unsharded op.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py). Verifies the
SURVEY §2.6 'ring-shift' extension: forward, input gradient, and the
psum-then-normalize shift gradient all match the single-device op, in both
the normalized and unnormalized gradient modes (the unnormalized check
would catch a double-psum that L2 normalization can mask).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rubiksnet_tpu.ops import rubiks_shift_3d
from rubiksnet_tpu.ops.attention_shift import attention_shift
from rubiksnet_tpu.parallel.temporal import (
    halo_exchange_time, temporal_attention_shift, temporal_rubiks_shift_3d,
    time_shard_clip,
)

N, T, H, W, C = 2, 8, 6, 6, 8
K = 1


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:4])
    return Mesh(devs, ("time",))


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, T, H, W, C), jnp.float32)
    shift = jnp.asarray(rng.uniform(-1, 1, (3, C)), jnp.float32)
    return x, shift


def _sharded_fn(mesh, **kw):
    fn = lambda x, s: temporal_rubiks_shift_3d(
        x, s, axis_name="time", max_shift=K, backend="gather", **kw
    )
    return jax.jit(
        shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, "time"), P()),
            out_specs=P(None, "time"),
           
        )
    )


def test_halo_exchange_boundary_zeros(mesh, data):
    x, _ = data
    f = jax.jit(
        shard_map(
            lambda v: halo_exchange_time(v, K, "time"),
            mesh=mesh, in_specs=P(None, "time"),
            out_specs=P(None, "time"),
        )
    )
    out = np.asarray(f(time_shard_clip(x, mesh)))
    t_loc = T // 4
    out = out.reshape(N, 4, t_loc + 2 * K, H, W, C, order="C") \
        if out.shape[1] == 4 * (t_loc + 2 * K) else None
    assert out is not None
    xs = np.asarray(x).reshape(N, 4, t_loc, H, W, C)
    # interior of each extended shard == its own frames
    np.testing.assert_array_equal(out[:, :, K:-K], xs)
    # left halo of shard 0 / right halo of shard -1 are zeros
    assert np.all(out[:, 0, :K] == 0) and np.all(out[:, -1, -K:] == 0)
    # other halos are the true neighbor frames
    np.testing.assert_array_equal(out[:, 1, :K], xs[:, 0, -K:])
    np.testing.assert_array_equal(out[:, 2, -K:], xs[:, 3, :K])


@pytest.mark.parametrize("stride", [1, 2])
def test_forward_matches_unsharded(mesh, data, stride):
    x, shift = data
    want = rubiks_shift_3d(
        x, shift, stride=(1, stride, stride), backend="gather", max_shift=K
    )
    got = _sharded_fn(mesh, stride=stride)(time_shard_clip(x, mesh), shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("normalize", [True, False])
def test_grads_match_unsharded(mesh, data, normalize):
    x, shift = data

    def loss_ref(x_, s_):
        y = rubiks_shift_3d(
            x_, s_, normalize_grad=normalize, backend="gather", max_shift=K
        )
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    sharded = _sharded_fn(mesh, normalize_grad=normalize)

    def loss_shard(x_, s_):
        y = sharded(x_, s_)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    gx_ref, gs_ref = jax.grad(loss_ref, argnums=(0, 1))(x, shift)
    gx, gs = jax.grad(loss_shard, argnums=(0, 1))(
        time_shard_clip(x, mesh), shift
    )
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-6)
    # the unnormalized comparison catches a double-psum (uniform scaling),
    # which the per-channel L2 normalization would hide; rtol covers f32
    # summation-order noise between psum-of-partials and a single-pass sum
    np.testing.assert_allclose(
        np.asarray(gs), np.asarray(gs_ref), rtol=1e-5, atol=1e-6
    )
    if normalize:
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(gs), axis=0), 1.0, atol=1e-6
        )


def test_attention_shift_matches_unsharded(mesh, data):
    x, _ = data
    rng = np.random.RandomState(3)
    weight = jnp.asarray(rng.randn(C, 3), jnp.float32)
    want = attention_shift(x, weight)
    f = jax.jit(
        shard_map(
            lambda v, w: temporal_attention_shift(v, w, axis_name="time"),
            mesh=mesh, in_specs=(P(None, "time"), P()),
            out_specs=P(None, "time"),
        )
    )
    got = f(time_shard_clip(x, mesh), weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("variant", ["rubiks3d", "rubiks3d-aq"])
def test_model_sequence_parallel_eval(mesh, variant):
    """Full-model eval with T sharded 4-way == the unsharded forward: the
    shift layers route through the halo exchange automatically and the TSN
    consensus pmeans across time shards."""
    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.parallel.temporal import sequence_parallel_eval

    bundle = create_rubiksnet(
        "tiny", num_classes=7, num_frames=T, input_size=32, variant=variant,
        shift_backend="gather", shift_max_shift=1,
    )
    video = jnp.asarray(
        np.random.RandomState(5).randn(2, T, 32, 32, 3), jnp.float32
    )
    want = bundle.model.apply(bundle.variables, video, train=False)
    fn = sequence_parallel_eval(bundle.model, bundle.variables, mesh)
    got = fn(time_shard_clip(video, mesh))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_pjit_time_sharded_train_step(mesh):
    """Long-clip TRAINING via jit sharding propagation: a train step whose
    video is sharded along T is one logical computation (global BN stats,
    globally-normalized shift grads by construction) — XLA inserts the
    halo collectives. Must produce the unsharded step's numbers."""
    from rubiksnet_tpu.models import create_rubiksnet
    from rubiksnet_tpu.train.optim import sgd_with_shift_mult
    from rubiksnet_tpu.train.steps import create_train_state, make_train_step

    bundle = create_rubiksnet(
        "tiny", num_classes=5, num_frames=T, input_size=32,
        shift_backend="gather", shift_max_shift=1, remat=True,
    )
    tx = sgd_with_shift_mult(lr=1e-2, lr_shift_mult=0.1)
    state = create_train_state(bundle, tx)
    step = jax.jit(make_train_step(bundle.model, tx))
    rng = np.random.RandomState(11)
    video = jnp.asarray(rng.randn(4, T, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, 4), jnp.int32)

    _, metrics_ref = step(state, video, labels)
    with mesh:
        _, metrics_sp = step(state, time_shard_clip(video, mesh), labels)
    np.testing.assert_allclose(
        float(metrics_sp["loss"]), float(metrics_ref["loss"]), rtol=1e-5
    )


def test_halo_too_small_asserts(mesh, data):
    """A halo larger than the local shard (K=3 > T_loc=2) must fail loudly
    at trace time, not silently read short."""
    x, shift = data
    fn = lambda v, s: temporal_rubiks_shift_3d(
        v, s, axis_name="time", max_shift=3, backend="gather"
    )
    f = shard_map(
        fn, mesh=mesh, in_specs=(P(None, "time"), P()),
        out_specs=P(None, "time"),
    )
    with pytest.raises(AssertionError):
        jax.eval_shape(f, jax.ShapeDtypeStruct(x.shape, x.dtype),
                       jax.ShapeDtypeStruct(shift.shape, shift.dtype))

"""utils/benchmark timing helpers: correctness of the chained-loop plumbing.

These don't assert wall-clock magnitudes (meaningless on a shared CPU); they
assert the structural contract the benches and A/B harnesses rely on:
chained loops compose the function N times with a zero-valued data
dependency (so timing N iterations times N *real* applications), and
ChainedTimer returns positive per-application seconds without retracing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rubiksnet_tpu.utils.benchmark import (
    ChainedTimer,
    time_chained,
    time_chained_carry,
)


def test_chained_timer_positive_and_reusable():
    x = jnp.asarray(np.random.RandomState(0).randn(64, 128), jnp.float32)

    def fn(v):
        return jnp.tanh(v @ v.T) @ v

    t = ChainedTimer(fn, x, n_lo=1, n_hi=64)
    s1 = t.sample(repeats=2)
    s2 = t.sample(repeats=2)
    assert s1 > 0 and s2 > 0
    # A sample is seconds per *one* application: far below the full-loop
    # wall time and far above zero.
    assert s1 < 10.0


def test_chained_timer_does_not_perturb_values():
    """The chained dependency injects exactly zero: the carry after N rounds
    is the original input, so its scalar digest (the loop's fetch-cheap
    return value) equals sum(x)."""
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)

    def fn(v):
        return v * 2.0 + 1.0

    t = ChainedTimer(fn, x, n_lo=1, n_hi=4)
    digest = t._hi(x)
    np.testing.assert_allclose(
        np.asarray(digest), float(np.asarray(x).sum()), rtol=1e-5)


def test_time_chained_matches_timer_scale():
    x = jnp.asarray(np.random.RandomState(2).randn(64, 128), jnp.float32)

    def fn(v):
        return jnp.tanh(v @ v.T) @ v

    dt = time_chained(fn, x, n_lo=1, n_hi=64, repeats=2)
    assert dt > 0


def test_time_chained_carry_on_train_like_step():
    def step(c):
        return jax.tree_util.tree_map(lambda a: a * 0.999 + 1e-3, c)

    carry = {"w": jnp.ones((32, 32)), "b": jnp.zeros((32,))}
    dt = time_chained_carry(step, carry, n_lo=1, n_hi=64, repeats=2)
    assert dt > 0

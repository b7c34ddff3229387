"""Scanned-stage layout (nn.scan over repeated blocks) equivalence.

RubiksNetBackbone(scan_blocks=True) runs each stage's non-entry blocks under
one lax.scan with stacked params so the serialized train-step HLO shrinks
~6x (what lets the Large remat backward through this runtime's graph-size
cap — docs/PERF_NOTES.md). These tests pin:

  * the converted layout structurally matches a fresh scanned init,
  * inference outputs match the unrolled model exactly,
  * train-step loss/updates match in float64 (f32 diverges chaotically
    through 16 train-mode BN normalizations — both layouts are the same
    math, verified here at 1e-8 in x64),
  * the conversion round-trips bit-identically.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from rubiksnet_tpu.models import create_rubiksnet
from rubiksnet_tpu.models.scan_convert import (
    bundle_to_scanned,
    bundle_to_unrolled,
    variables_to_scanned,
    variables_to_unrolled,
)

pytestmark = pytest.mark.slow


def _leaf_shapes(tree):
    return jtu.tree_map(jnp.shape, jax.device_get(dict(tree)))


def test_scanned_init_structure_matches_converted():
    kw = dict(num_classes=4, num_frames=2, input_size=16,
              shift_backend="conv", shift_max_shift=1)
    b = create_rubiksnet("tiny", **kw)
    bs = bundle_to_scanned(b)
    fresh = create_rubiksnet("tiny", scan_blocks=True, **kw)
    assert _leaf_shapes(bs.variables) == _leaf_shapes(fresh.variables)


@pytest.mark.parametrize("variant", ["rubiks3d", "rubiks3d-aq"])
def test_scanned_infer_matches_unrolled(variant):
    b = create_rubiksnet(
        "tiny", num_classes=4, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=1, variant=variant,
    )
    bs = bundle_to_scanned(b)
    v = jnp.asarray(
        np.random.RandomState(0).randn(2, 2, 16, 16, 3), jnp.float32
    )
    want = b.model.apply(b.variables, v, train=False)
    got = bs.model.apply(bs.variables, v, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_scan_convert_round_trip_identity():
    b = create_rubiksnet(
        "small", num_classes=3, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=1,
    )
    rt = variables_to_unrolled(
        variables_to_scanned(b.variables, "small"), "small"
    )
    jtu.tree_map(
        lambda a, c: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(c)
        ),
        dict(b.variables), rt,
    )


def test_scanned_train_step_matches_unrolled_x64():
    """One full train step (loss, grads, SGD update, BN stats) in float64:
    the layouts are the same program, so everything agrees to ~1e-8."""
    from rubiksnet_tpu.train import (
        create_train_state, make_train_step, sgd_with_shift_mult,
    )

    b = create_rubiksnet(
        "tiny", num_classes=4, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=1, dtype=jnp.float64,
    )
    vars64 = jtu.tree_map(
        lambda l: l.astype(jnp.float64)
        if jnp.issubdtype(l.dtype, jnp.floating) else l,
        dict(b.variables),
    )
    b = type(b)(model=b.model, variables=vars64)
    bs = bundle_to_scanned(b)

    tx = sgd_with_shift_mult(1e-3, 0.1)
    step_u = make_train_step(b.model, tx)
    step_s = make_train_step(bs.model, tx)
    v = jnp.asarray(
        np.random.RandomState(0).randn(2, 2, 16, 16, 3), jnp.float64
    )
    labels = jnp.asarray([1, 3], jnp.int32)
    new_u, m_u = step_u(create_train_state(b, tx), v, labels)
    new_s, m_s = step_s(create_train_state(bs, tx), v, labels)
    assert abs(float(m_u["loss"]) - float(m_s["loss"])) < 1e-8

    # Updated params agree after unstacking the scanned layout back.
    unrolled_s = variables_to_unrolled(
        {"params": new_s.params, "batch_stats": new_s.batch_stats},
        "tiny",
    )
    for col, got in (("params", unrolled_s["params"]),
                     ("batch_stats", unrolled_s["batch_stats"])):
        want = new_u.params if col == "params" else new_u.batch_stats
        diffs = jtu.tree_map(
            lambda a, c: float(jnp.max(jnp.abs(a - c))),
            jax.device_get(dict(want)), jax.device_get(got),
        )
        worst = max(jtu.tree_leaves(diffs))
        assert worst < 1e-7, (col, worst)


def test_scanned_remat_train_smoke():
    """remat + scan compose (the production Large-training configuration):
    the step must run and produce a finite loss."""
    from rubiksnet_tpu.train import (
        create_train_state, make_train_step, sgd_with_shift_mult,
    )

    b = create_rubiksnet(
        "tiny", num_classes=4, num_frames=2, input_size=16,
        shift_backend="conv", shift_max_shift=1, remat=True,
        scan_blocks=True,
    )
    tx = sgd_with_shift_mult(1e-3, 0.1)
    step = jax.jit(make_train_step(b.model, tx))
    v = jnp.asarray(
        np.random.RandomState(0).randn(2, 2, 16, 16, 3), jnp.float32
    )
    state, metrics = step(
        create_train_state(b, tx), v, jnp.asarray([0, 2], jnp.int32)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

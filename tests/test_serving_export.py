"""jax.export serving artifacts: serialize -> deserialize -> run parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from rubiksnet_tpu.models import create_rubiksnet
from rubiksnet_tpu.serving import (
    export_eval_fn, load_exported, run_exported, save_exported,
)

pytestmark = pytest.mark.slow

N, CROPS, T, SIZE = 2, 2, 2, 16


@pytest.fixture(scope="module")
def bundle():
    return create_rubiksnet(
        "tiny", num_classes=5, num_frames=T, input_size=SIZE,
    )


def _video(batch=N):
    return np.random.RandomState(0).randn(
        batch, CROPS, T, SIZE, SIZE, 3
    ).astype(np.float32)


def _expected(bundle, video):
    flat = video.reshape((-1,) + video.shape[2:])
    out = np.asarray(bundle(jnp.asarray(flat), train=False))
    return out.reshape(video.shape[0], CROPS, -1).mean(axis=1)


def test_export_roundtrip_matches_model(bundle, tmp_path):
    exported = export_eval_fn(
        bundle, N, num_crops=CROPS, input_size=SIZE
    )
    path = str(tmp_path / "tiny.jaxexport")
    save_exported(path, exported)
    video = _video()
    got = np.asarray(run_exported(load_exported(path), jnp.asarray(video)))
    np.testing.assert_allclose(
        got, _expected(bundle, video), rtol=2e-4, atol=2e-5
    )


def test_export_polymorphic_batch(bundle, tmp_path):
    exported = export_eval_fn(
        bundle, N, num_crops=CROPS, input_size=SIZE, polymorphic_batch=True
    )
    path = str(tmp_path / "tiny_poly.jaxexport")
    save_exported(path, exported)
    loaded = load_exported(path)
    for batch in (1, 3):
        video = _video(batch)
        got = np.asarray(run_exported(loaded, jnp.asarray(video)))
        np.testing.assert_allclose(
            got, _expected(bundle, video), rtol=2e-4, atol=2e-5
        )

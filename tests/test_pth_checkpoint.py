"""End-to-end .pth.tar checkpoint loading through the real torch path.

Builds a reference-format checkpoint dict ({tier, num_classes, num_frames,
variant, model: state_dict}, rubiksnet/models.py:52-62) with torch tensors,
saves it with torch.save, and loads it with load_pretrained — verifying the
whole torch -> flax conversion pipeline produces identical logits.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rubiksnet_tpu.models import create_rubiksnet, load_pretrained
from rubiksnet_tpu.models.pretrained import export_torch_state_dict


@pytest.mark.parametrize("variant", ["rubiks3d", "rubiks3d-aq"])
def test_pth_tar_roundtrip(tmp_path, variant):
    src = create_rubiksnet(
        "tiny", num_classes=5, num_frames=4, variant=variant, input_size=32
    )
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(src).items()
    }
    ckpt = {
        "tier": "tiny",
        "num_classes": 5,
        "num_frames": 4,
        "variant": variant,
        "model": sd,
    }
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save(ckpt, path)

    loaded = load_pretrained(path)
    assert loaded.model.tier == "tiny"
    assert loaded.model.variant == variant

    video = jnp.asarray(
        np.random.RandomState(0).randn(1, 4, 32, 32, 3), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(src(video)), np.asarray(loaded(video)), rtol=1e-6, atol=1e-6
    )


def test_pth_tar_shape_mismatch_rejected(tmp_path):
    src = create_rubiksnet("tiny", num_classes=5, num_frames=4, input_size=32)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(src).items()
    }
    sd["new_fc.weight"] = torch.zeros(7, 432)  # wrong class count
    torch.save(
        {
            "tier": "tiny",
            "num_classes": 5,
            "num_frames": 4,
            "variant": "rubiks3d",
            "model": sd,
        },
        str(tmp_path / "bad.pth.tar"),
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained(str(tmp_path / "bad.pth.tar"))

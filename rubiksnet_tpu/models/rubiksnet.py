"""RubiksNet public model API.

Mirrors rubiksnet/models.py: tier table (28-43), TSN temporal-mean consensus
head (112-117), crop/scale sizes and input normalization constants (107-125),
checkpoint save/load dict format (52-62).

Native input layout is channel-last (N, T, H, W, 3); ``from_ntchw`` converts
the reference's (N, T, 3, H, W).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from ..nn.backbone import RubiksNetBackbone

TIERS = {
    # tier -> (width, repeats, use_se)   (rubiksnet/models.py:28-43)
    "tiny": (54, (3, 4, 6, 3), False),
    "small": (72, (3, 4, 6, 3), True),
    "medium": (72, (3, 4, 23, 3), False),
    "large": (72, (3, 8, 36, 3), False),
}

VARIANTS = ("rubiks3d", "rubiks3d-aq")

# ImageNet normalization (models.py:108-109).
INPUT_MEAN = (0.485, 0.456, 0.406)
INPUT_STD = (0.229, 0.224, 0.225)
INPUT_SIZE = 224


class RubiksNet(nn.Module):
    """Video action-recognition model with learnable fractional shifts."""

    tier: str
    num_classes: int
    num_frames: int = 8
    variant: str = "rubiks3d"
    quantize: bool = False
    shift_backend: str = "gather"
    shift_max_shift: int = 4
    remat: bool = False
    scan_blocks: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        assert self.tier in TIERS, f"unknown tier {self.tier}"
        assert self.variant in VARIANTS, f"unknown variant {self.variant}"
        width, repeats, use_se = TIERS[self.tier]
        self.backbone = RubiksNetBackbone(
            width=width,
            repeats=repeats,
            num_classes=None,
            use_se=use_se,
            variant=self.variant,
            quantize=self.quantize,
            shift_backend=self.shift_backend,
            shift_max_shift=self.shift_max_shift,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
            name="backbone",
        )
        self.new_fc = nn.Dense(self.num_classes, dtype=self.dtype, name="new_fc")

    @property
    def feature_dim(self):
        return 8 * TIERS[self.tier][0]

    @property
    def crop_size(self):
        return INPUT_SIZE

    @property
    def scale_size(self):
        return INPUT_SIZE * 256 // 224

    def __call__(self, video, train: bool = False):
        """video: (N, T, H, W, 3) normalized RGB -> (N, num_classes) logits.

        Per-frame features -> per-frame logits -> mean over frames (the TSN
        consensus of models.py:112-117)."""
        assert video.ndim == 5 and video.shape[-1] == 3, (
            f"expected (N, T, H, W, 3), got {video.shape}"
        )
        feats = self.backbone(video, train=train)  # (N, T, feature_dim)
        logits = self.new_fc(feats)  # (N, T, num_classes)
        # TSN consensus. Under a time-axis shard_map (sequence parallelism)
        # each shard holds T_loc frames: local mean + pmean over equal
        # shards == the global mean, and the logits come out replicated.
        from ..parallel.temporal import active_time_axis

        axis = active_time_axis()
        local_mean = jnp.mean(logits, axis=1)
        if axis is not None:
            import jax

            return jax.lax.pmean(local_mean, axis)
        return local_mean


def from_ntchw(video):
    """Convert reference-layout (N, T, 3, H, W) video to (N, T, H, W, 3)."""
    return jnp.transpose(video, (0, 1, 3, 4, 2))


@dataclasses.dataclass
class RubiksNetBundle:
    """A model definition plus its variables — the convenient stateful handle
    (JAX modules are functional; this plays the role of the torch nn.Module
    instance)."""

    model: RubiksNet
    variables: FrozenDict

    @property
    def params(self):
        return self.variables["params"]

    @property
    def batch_stats(self):
        return self.variables.get("batch_stats", FrozenDict())

    def __call__(self, video, train: bool = False, mutable=False):
        return self.model.apply(self.variables, video, train=train, mutable=mutable)

    def to_scanned(self):
        """Same weights, scanned-stage layout (see nn/backbone.py): the
        repeated stride-1 blocks run under one lax.scan with stacked params.
        Use for training large tiers (the serialized graph is ~6x smaller).
        """
        from .scan_convert import bundle_to_scanned

        return bundle_to_scanned(self)

    def to_unrolled(self):
        """Inverse of to_scanned: back to the canonical per-block layout
        (what checkpoints store and the fused inference executor consumes).
        """
        from .scan_convert import bundle_to_unrolled

        return bundle_to_unrolled(self)

    def replace_new_fc(self, num_classes: int, rng=None):
        """Fresh classification head (models.py:64-65)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        new_model = RubiksNet(
            tier=self.model.tier,
            num_classes=num_classes,
            num_frames=self.model.num_frames,
            variant=self.model.variant,
            quantize=self.model.quantize,
            shift_backend=self.model.shift_backend,
            shift_max_shift=self.model.shift_max_shift,
            remat=self.model.remat,
            scan_blocks=self.model.scan_blocks,
            dtype=self.model.dtype,
        )
        feature_dim = 8 * TIERS[self.model.tier][0]
        new_head = {
            "kernel": nn.initializers.lecun_normal()(
                rng, (feature_dim, num_classes), jnp.float32
            ),
            "bias": jnp.zeros((num_classes,), jnp.float32),
        }
        variables = dict(self.variables)
        params = dict(variables["params"])
        params["new_fc"] = new_head
        variables["params"] = params
        return RubiksNetBundle(model=new_model, variables=FrozenDict(variables))


def create_rubiksnet(
    tier: str,
    num_classes: int,
    num_frames: int = 8,
    variant: str = "rubiks3d",
    rng: Optional[jax.Array] = None,
    dtype: Any = jnp.float32,
    input_size: int = INPUT_SIZE,
    quantize: bool = False,
    shift_backend: str = "gather",
    shift_max_shift: int = 4,
    remat: bool = False,
    scan_blocks: bool = False,
) -> RubiksNetBundle:
    """Build a randomly initialized RubiksNet (the functional analogue of
    RubiksNet(...) construction in the reference)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = RubiksNet(
        tier=tier,
        num_classes=num_classes,
        num_frames=num_frames,
        variant=variant,
        quantize=quantize,
        shift_backend=shift_backend,
        shift_max_shift=shift_max_shift,
        remat=remat,
        scan_blocks=scan_blocks,
        dtype=dtype,
    )
    dummy = jnp.zeros((1, num_frames, input_size, input_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return RubiksNetBundle(model=model, variables=variables)

"""RubiksNet backbone: a ResNet-style network whose spatial/temporal mixing
is done entirely by learnable shifts + 1x1 convolutions.

Faithful functional port of rubiksnet/backbone.py (block structure at
74-135, stage layout at 156-200) on channel-last (N, T, H, W, C) tensors.
All the FLOPs live in 1x1 convolutions, which XLA lowers to MXU matmuls;
the shift ops are bandwidth-bound vector work.

Unlike the reference, the variant surgery (rubiks3d wrap / AQ attention
prepend, rubiksnet/models.py:67-110) happens at construction via the
``variant`` field instead of post-hoc module replacement.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import AttentionShift, Rubiks3DWrap, RubiksShift2D, SELayer

# He-normal with fan_out = kh*kw*out_channels, matching conv2d_init
# (rubiksnet/backbone.py:13-18).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def BN(dtype, name):
    # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax momentum is the
    # retained fraction, so 0.9). weight=1 / bias=0 init matches
    # norm_layer_init (backbone.py:31-35).
    return nn.BatchNorm(
        use_running_average=None,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class RubiksShiftBlock(nn.Module):
    """Pre-activation bottleneck-with-shift block (backbone.py:74-135).

    BN1 -> ReLU -> [AQ: attention temporal shift] -> 1x1 conv (in->mid)
    -> BN2 -> ReLU -> spatial/3D shift (carries the block's stride)
    -> optional SE -> 1x1 conv (mid->out) -> + shortcut.

    The shortcut is a strided 1x1 conv on the *activated* tensor when the
    stride or channel count changes, else the raw input (backbone.py:104-127).
    """

    in_planes: int
    out_planes: int
    stride: int = 1
    expansion: float = 1.0
    use_se: Any = False
    variant: str = "rubiks3d"
    quantize: bool = False
    normalize_grad: bool = True
    init_shift: str = "uniform"
    shift_backend: str = "gather"
    shift_max_shift: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        mid = int(self.out_planes * self.expansion)
        self._mid = mid
        self.bn1 = BN(self.dtype, "bn1")
        self.conv2 = nn.Conv(
            mid, (1, 1), use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv2",
        )
        self.bn2 = BN(self.dtype, "bn2")
        if self.variant == "rubiks3d":
            self.as3 = Rubiks3DWrap(
                mid, stride=self.stride, name="as3",
                quantize=self.quantize,
                backend=self.shift_backend, max_shift=self.shift_max_shift,
            )
        elif self.variant == "rubiks3d-aq":
            # AQ: temporal attention shift prepended to conv2
            # (models.py:74-79); the spatial shift stays 2D.
            self.aq_shift = AttentionShift(self.in_planes, name="aq_shift")
            self.as3 = RubiksShift2D(
                mid,
                stride=self.stride,
                normalize_grad=self.normalize_grad,
                quantize=self.quantize,
                init_shift=self.init_shift,
                backend=self.shift_backend,
                max_shift=self.shift_max_shift,
                name="as3",
            )
        else:
            raise NotImplementedError(f"Unknown variant: {self.variant}")
        if self.use_se:
            reduction = 12 if isinstance(self.use_se, bool) else int(self.use_se)
            assert reduction > 2, ("SE reduction must > 2", self.use_se)
            self.se = SELayer(mid, reduction=reduction, dtype=self.dtype)
        else:
            self.se = None
        self.conv3 = nn.Conv(
            self.out_planes, (1, 1), use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv3",
        )
        if self.stride != 1 or self.in_planes != self.out_planes:
            self.shortcut = nn.Conv(
                self.out_planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                name="shortcut",
            )
        else:
            self.shortcut = None

    def __call__(self, x, train: bool = False):
        out = nn.relu(self.bn1(x, use_running_average=not train))
        shortcut = x if self.shortcut is None else self.shortcut(out)
        if self.variant == "rubiks3d-aq":
            out = self.aq_shift(out)
        out = self.conv2(out)
        out = nn.relu(self.bn2(out, use_running_average=not train))
        out = self.as3(out)
        if self.se is not None:
            out = self.se(out)
        out = self.conv3(out)
        return out + shortcut


class BlockScanBody(nn.Module):
    """One iteration of a scanned stage: a single stride-1, equal-width
    RubiksShiftBlock with the (carry, ys) calling convention nn.scan needs.

    Used by RubiksNetBackbone(scan_blocks=True) to collapse the structurally
    identical non-entry blocks of a stage (stage3 of Large is 35 of them)
    into ONE traced block body under lax.scan with stacked params: the
    serialized train-step HLO shrinks ~6x, which is what lets the Large-tier
    remat backward through this runtime's graph-size cap (see
    docs/PERF_NOTES.md). Numerics are identical to the unrolled loop — the
    same ops run per block, in the same order.
    """

    planes: int
    expansion: float = 1.0
    use_se: Any = False
    variant: str = "rubiks3d"
    quantize: bool = False
    normalize_grad: bool = True
    init_shift: str = "uniform"
    shift_backend: str = "gather"
    shift_max_shift: int = 4
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = (
            nn.remat(RubiksShiftBlock, static_argnums=(2,))
            if self.remat
            else RubiksShiftBlock
        )
        x = block_cls(
            in_planes=self.planes,
            out_planes=self.planes,
            stride=1,
            expansion=self.expansion,
            use_se=self.use_se,
            variant=self.variant,
            quantize=self.quantize,
            normalize_grad=self.normalize_grad,
            init_shift=self.init_shift,
            shift_backend=self.shift_backend,
            shift_max_shift=self.shift_max_shift,
            dtype=self.dtype,
            name="block",
        )(x, train)
        return x, None


def scan_stage(length: int):
    """nn.scan-lifted BlockScanBody over `length` blocks: params and BN
    batch stats gain a leading (length,) axis; the train flag broadcasts."""
    return nn.scan(
        BlockScanBody,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,),
        length=length,
    )


class RubiksNetBackbone(nn.Module):
    """Stage layout per rubiksnet/backbone.py:156-200: a 3x3 stride-2 stem,
    then stages [1, r0, r1, r2, r3] of RubiksShiftBlocks with channel widths
    (w, w, 2w, 4w, 8w), final BN+ReLU, global average pool, optional fc.

    ``num_classes=None`` omits the classifier head (the RubiksNet model
    replaces it with its own new_fc, models.py:48-50).

    ``scan_blocks=True`` keeps each stage's entry block (stride/width
    change) unrolled and runs the remaining structurally identical blocks
    under one lax.scan with stacked params (see BlockScanBody). Parameter
    layout changes: layer{s}_1..layer{s}_{r-1} become layer{s}_scan/block
    with a leading block axis — convert with models/scan_convert.py.
    """

    width: int
    repeats: Sequence[int]
    expansion: float = 1.0
    num_classes: Optional[int] = 1000
    use_se: Any = False
    quantize: bool = False
    normalize_grad: bool = True
    init_shift: str = "uniform"
    variant: str = "rubiks3d"
    shift_backend: str = "gather"
    shift_max_shift: int = 4
    remat: bool = False
    scan_blocks: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(
            self.width, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, kernel_init=conv_init, dtype=self.dtype,
            name="conv1",
        )
        stages = []
        in_planes = self.width
        widths = [
            (self.width, 1, 1),
            (self.width, self.repeats[0], 2),
            (2 * self.width, self.repeats[1], 2),
            (4 * self.width, self.repeats[2], 2),
            (8 * self.width, self.repeats[3], 2),
        ]
        # Rematerializing each block bounds the backward graph (and live
        # activation memory): recompute the forward inside the block during
        # the backward pass instead of keeping one giant fused graph.
        block_cls = (
            nn.remat(RubiksShiftBlock, static_argnums=(2,))
            if self.remat
            else RubiksShiftBlock
        )
        for stage_idx, (planes, repeat, stride) in enumerate(widths):
            blocks = []
            unrolled = 1 if self.scan_blocks else repeat
            for b in range(min(repeat, unrolled)):
                blocks.append(
                    block_cls(
                        in_planes=in_planes,
                        out_planes=planes,
                        stride=stride if b == 0 else 1,
                        expansion=self.expansion,
                        use_se=self.use_se,
                        variant=self.variant,
                        quantize=self.quantize,
                        normalize_grad=self.normalize_grad,
                        init_shift=self.init_shift,
                        shift_backend=self.shift_backend,
                        shift_max_shift=self.shift_max_shift,
                        dtype=self.dtype,
                        name=f"layer{stage_idx}_{b}",
                    )
                )
                in_planes = planes
            if self.scan_blocks and repeat > 1:
                blocks.append(
                    scan_stage(repeat - 1)(
                        planes=planes,
                        expansion=self.expansion,
                        use_se=self.use_se,
                        variant=self.variant,
                        quantize=self.quantize,
                        normalize_grad=self.normalize_grad,
                        init_shift=self.init_shift,
                        shift_backend=self.shift_backend,
                        shift_max_shift=self.shift_max_shift,
                        remat=self.remat,
                        dtype=self.dtype,
                        name=f"layer{stage_idx}_scan",
                    )
                )
                in_planes = planes
            stages.append(blocks)
        self.stages = stages
        self.bn_last = BN(self.dtype, "bn_last")
        if self.num_classes is not None:
            self.fc = nn.Dense(
                self.num_classes,
                kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype,
                name="fc",
            )

    @property
    def feature_dim(self):
        return 8 * self.width

    def __call__(self, x, train: bool = False):
        """x: (N, T, H, W, 3) -> features (N, T, 8*width) (or logits when a
        classifier head is configured)."""
        x = self.conv1(x)
        for blocks in self.stages:
            for block in blocks:
                out = block(x, train)
                # Scanned stages use the (carry, ys) convention; ys is None.
                x = out[0] if isinstance(out, tuple) else out
        x = nn.relu(self.bn_last(x, use_running_average=not train))
        x = jnp.mean(x, axis=(2, 3))  # global average pool -> (N, T, C)
        if self.num_classes is not None:
            x = self.fc(x)
        return x

"""Flax modules for the RubiksNet building blocks.

TPU-first re-design of the reference torch modules:
  * rubiksnet/shiftlib/rubiks2d/layer.py (RubiksShift2D)
  * rubiksnet/shiftlib/rubiks3d/layer.py (RubiksShift3D / RubiksShiftBase)
  * rubiksnet/models.py:128-145 (_Rubiks3DWrap)
  * rubiksnet/attention_shift.py (AttentionShift)
  * rubiksnet/backbone.py:56-71 (SELayer)

All modules operate on channel-last clip tensors (N, T, H, W, C). The time
dimension stays explicit end-to-end (the reference flattens it into the batch
and reshapes inside the 3D wrapper, models.py:139-145); convolutions and
batch norm simply treat (N, T) as batch dimensions.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import shift2d as s2d
from ..ops import shift3d as s3d
from ..ops.attention_shift import attention_shift as _attention_shift_fn

IntPair = Union[int, Sequence[int]]


def uniform_shift_init(scale=1.0):
    """U(-1, 1) shift init (rubiksnet/shiftlib/rubiks3d/layer.py:21-22)."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def group_shift_init(kernel_size: int):
    """0-FLOP conv-like grid init for 2D shifts
    (rubiksnet/shiftlib/rubiks2d/layer.py:6-15)."""

    def init(key, shape, dtype=jnp.float32):
        dim, c = shape
        assert dim == 2
        k = kernel_size
        s = k // 2
        r = np.arange(-s, s + 1, dtype=np.float64)
        groups = c // k**2
        alpha = np.tile(r, k * groups)
        beta = np.tile(np.repeat(r, k), groups)
        out = np.zeros((2, c))
        out[0, : alpha.size] = alpha
        out[1, : beta.size] = beta
        return jnp.asarray(out, dtype)

    return init


def init_shift1d_nfold(shift, nfold=8, noise=1e-3, rng=None):
    """TSM-style hard-coded 1D shift init
    (rubiksnet/shiftlib/rubiks3d/layer.py:25-40): first 1/nfold of channels
    shift +1, next 1/nfold shift -1, rest jittered near zero. `shift` is a
    (1, C) array; returns a new array."""
    import jax

    dim, channels = shift.shape
    assert dim == 1, "only works with rubiks1d"
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    group = channels // nfold
    out = jnp.asarray(shift)
    out = out.at[:, :group].set(1.0)
    out = out.at[:, group : 2 * group].set(-1.0)
    jitter = jax.random.uniform(
        rng, (1, channels - 2 * group), out.dtype, -noise, noise
    )
    return out.at[:, 2 * group :].set(jitter)


def create_3d_from_2d(shift_2d, init_mode="tsm", rng=None):
    """Build a (3, C) 3D shift array from a (2, C) 2D shift, with the
    temporal row initialized per rubiksnet/shiftlib/rubiks3d/layer.py:110-154
    (modes: 'tsm', 'tsm-g<STD>', 'uni<MAG>', 'none')."""
    import jax

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    shift_2d = jnp.asarray(shift_2d)
    _, c = shift_2d.shape
    fold = c // 8
    if init_mode.startswith("tsm-g"):
        stddev = float(init_mode[5:]) or 1e-2
        k1, k2, k3 = jax.random.split(rng, 3)
        t = jnp.concatenate(
            [
                1.0 + jax.random.normal(k1, (fold,)) * stddev,
                -1.0 + jax.random.normal(k2, (fold,)) * stddev,
                jax.random.normal(k3, (c - 2 * fold,)) * stddev,
            ]
        )
    elif init_mode == "tsm":
        t = jnp.concatenate(
            [jnp.ones(fold), -jnp.ones(fold), jnp.zeros(c - 2 * fold)]
        )
    elif init_mode.startswith("uni"):
        magnitude = float(init_mode[3:])
        assert magnitude > 0, f"uniform random magnitude must > 0: {magnitude}"
        t = jax.random.uniform(rng, (c,), shift_2d.dtype, -1, 1) * magnitude
    elif init_mode.lower() == "none":
        t = jnp.full((c,), jnp.nan)  # must be loaded downstream; NaN safeguard
    else:
        raise NotImplementedError(f"unknown init mode {init_mode}")
    return jnp.concatenate([t[None, :].astype(shift_2d.dtype), shift_2d], axis=0)


class RubiksShift2D(nn.Module):
    """Learnable per-channel fractional 2D shift layer.

    Mirrors rubiksnet/shiftlib/rubiks2d/layer.py:18-52. Accepts either
    (N, H, W, C) or (N, T, H, W, C) input (the extra time dim is folded into
    the batch, matching how the reference runs 2D shifts on flattened clips).
    """

    num_channels: int
    stride: IntPair = 1
    padding: IntPair = 0
    normalize_grad: bool = True
    quantize: bool = False
    init_shift: str = "uniform"
    backend: str = "gather"
    max_shift: int = 4

    def setup(self):
        if self.init_shift == "uniform":
            init = uniform_shift_init()
        elif self.init_shift.startswith("group"):
            kernel = int(self.init_shift[5:])
            assert kernel > 1
            init = group_shift_init(kernel)
        else:
            raise NotImplementedError(f"unrecognized init shift {self.init_shift}")
        self.shift = self.param("shift", init, (2, self.num_channels))

    def __call__(self, x):
        squeeze = False
        if x.ndim == 5:
            n, t, h, w, c = x.shape
            x = x.reshape(n * t, h, w, c)
            squeeze = (n, t)
        out = s2d.rubiks_shift_2d(
            x,
            self.shift,
            stride=self.stride,
            padding=self.padding,
            normalize_grad=self.normalize_grad,
            enable_shift_grad=True,
            quantize=self.quantize,
            backend=self.backend,
            max_shift=self.max_shift,
        )
        if squeeze:
            n, t = squeeze
            out = out.reshape(n, t, *out.shape[1:])
        return out


class RubiksShift3D(nn.Module):
    """Learnable per-channel fractional 3D (T, H, W) shift layer.

    Mirrors rubiksnet/shiftlib/rubiks3d/layer.py:86-107. Input (N, T, H, W, C).
    """

    num_channels: int
    stride: IntPair = (1, 1, 1)
    padding: IntPair = (0, 0, 0)
    normalize_grad: bool = True
    normalize_t_factor: Any = 1.0
    quantize: bool = False
    backend: str = "gather"
    max_shift: int = 4

    def setup(self):
        self.shift = self.param(
            "shift", uniform_shift_init(), (3, self.num_channels)
        )

    def __call__(self, x):
        # Inside a time-axis shard_map (sequence parallelism), route through
        # the ring halo-exchange variant; semantics are identical
        # (parallel/temporal.py). Only the model's (1, s, s)/pad-0 geometry
        # is supported there.
        from ..parallel import temporal as _tp

        axis = _tp.active_time_axis()
        if axis is not None:
            st, sh, sw = s3d._triple(self.stride)
            pt, ph, pw = s3d._triple(self.padding)
            assert st == 1 and (pt, ph, pw) == (0, 0, 0), (
                "sequence-parallel shift supports stride (1, s, s), pad 0 "
                f"only; got stride {(st, sh, sw)} pad {(pt, ph, pw)}"
            )
            assert self.normalize_t_factor != "auto", (
                "resolve 'auto' t-factor with the global T before sharding"
            )
            return _tp.temporal_rubiks_shift_3d(
                x,
                self.shift,
                axis_name=axis,
                stride=(sh, sw),
                normalize_grad=self.normalize_grad,
                normalize_t_factor=self.normalize_t_factor,
                quantize=self.quantize,
                backend=self.backend,
                max_shift=self.max_shift,
            )
        return s3d.rubiks_shift_3d(
            x,
            self.shift,
            stride=self.stride,
            padding=self.padding,
            normalize_grad=self.normalize_grad,
            normalize_t_factor=self.normalize_t_factor,
            quantize=self.quantize,
            backend=self.backend,
            max_shift=self.max_shift,
        )


class Rubiks3DWrap(nn.Module):
    """Wrapper matching _Rubiks3DWrap (rubiksnet/models.py:128-145): a 3D
    shift with stride (1, s, s) standing in for a 2D shift inside a block.
    Named child "rubiks3d" so checkpoint paths line up
    (torch key: ...as3.rubiks3d.shift)."""

    num_channels: int
    stride: IntPair = 1
    padding: IntPair = 0
    quantize: bool = False
    backend: str = "gather"
    max_shift: int = 4

    def setup(self):
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        self.rubiks3d = RubiksShift3D(
            self.num_channels, stride=(1, sh, sw), padding=(0, ph, pw),
            quantize=self.quantize,
            backend=self.backend, max_shift=self.max_shift,
        )

    def __call__(self, x):
        return self.rubiks3d(x)


def _pair(v):
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(u) for u in v)
    assert len(t) == 2
    return t


class AttentionShift(nn.Module):
    """Softmax-attention 3-tap temporal shift (rubiksnet/attention_shift.py).

    The reference creates its (C, 3) weight lazily on first forward with
    torch.rand (U[0, 1)); here it is an eager parameter with the same init.
    The temperature is a fixed non-trainable constant (2.0).
    """

    num_channels: int
    temperature: float = 2.0

    def setup(self):
        import jax

        self.weight = self.param(
            "weight",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype
            ),
            (self.num_channels, 3),
        )

    def __call__(self, x):
        from ..parallel import temporal as _tp

        axis = _tp.active_time_axis()
        if axis is not None:
            return _tp.temporal_attention_shift(
                x, self.weight, self.temperature, axis_name=axis
            )
        return _attention_shift_fn(x, self.weight, self.temperature)


class SELayer(nn.Module):
    """Squeeze-and-excitation (rubiksnet/backbone.py:56-71): global average
    pool over (H, W), two bias-free dense layers, sigmoid gate."""

    channels: int
    reduction: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, T, H, W, C); pool per frame like the reference (which sees
        # (N*T, C, H, W)).
        y = jnp.mean(x, axis=(2, 3))  # (N, T, C)
        y = nn.Dense(
            self.channels // self.reduction, use_bias=False, name="fc1",
            dtype=self.dtype,
        )(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, name="fc2", dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, :, None, None, :]

"""Stacked hourglass, pre-activation re-implementation variant (the
reference's StackedHourglass, model/hourglass.py:92-151) — the network
train_hourglass_FT.py fine-tunes on H36M.

Differences from the torch7 variant, preserved exactly:
- pre-activation light_conv = BN(momentum=None, cumulative) -> ReLU -> Conv
  with bias=False (model/hourglass.py:7-12); bottleneck heavy_conv of three
  light_convs (:15-20);
- ResUnit skip is identity, or a *biased* 1x1 conv allocated only when
  channels change (:44-47);
- the stem's first BN+ReLU is commented out in the reference (:103-104) —
  so the 7x7 conv output feeds the first ResUnit directly;
- per-stack heads: prev(ResUnit + light 1x1), heatmap light 1x1 (bias=True),
  after light 1x1, skip light 1x1; out = after(pred) + skip + prev_tensor
  (:129-151);
- every BatchNorm runs in cumulative mode (momentum=None) from step one.

Layout/TPU choices identical to hourglass_torch7 (NHWC, static unroll,
stacked (S, B, H, W, J) output, compute-dtype knob).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from bilinear_tpu.core.norm import TorchBatchNorm
from bilinear_tpu.models.layers import ConvParams, conv2d
from bilinear_tpu.ops.int8 import int8_conv


def _conv(features, kernel, name, stride=1, bias=False, dtype=jnp.float32,
          fan_in=None):
    # Preact family default: bias-less convs (model/hourglass.py:7-12).
    return conv2d(features, kernel, name, bias=bias, stride=stride,
                  dtype=dtype, fan_in=fan_in)


_ConvP = ConvParams  # shared nn.Conv-mirroring param holder (layers.py)


class LightConv(nn.Module):
    """BN(cumulative) -> ReLU -> Conv(bias per config) (model/hourglass.py:7-12).

    ``quantize="int8"`` applies the conv as a dynamic-int8 MXU convolution
    at eval time (ops/int8.py); train mode and the variable tree are
    unchanged."""

    features: int
    kernel: int = 1
    bias: bool = False
    momentum: Optional[float] = None  # cumulative by default in this variant
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        h = TorchBatchNorm(momentum=self.momentum, dtype=jnp.promote_types(jnp.float32, self.dtype), name="bn")(
            x.astype(jnp.promote_types(jnp.float32, self.dtype)), train=train, momentum=momentum
        ).astype(self.dtype)
        h = nn.relu(h)
        fan_in = x.shape[-1] * self.kernel * self.kernel
        if self.quantize == "int8" and not train:
            k, b = _ConvP(
                (self.kernel, self.kernel, x.shape[-1], self.features),
                self.bias, fan_in if self.bias else None, name="conv",
            )()
            return int8_conv(h, k, b)
        return _conv(
            self.features, self.kernel, "conv", bias=self.bias,
            dtype=self.dtype, fan_in=fan_in if self.bias else None,
        )(h)


class ResUnit(nn.Module):
    """heavy_conv bottleneck + skip (model/hourglass.py:34-52)."""

    in_channels: int
    out_channels: int
    momentum: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None  # int8 body convs at eval (skip stays float)

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        half = self.out_channels // 2
        kw = dict(momentum=self.momentum, dtype=self.dtype,
                  quantize=self.quantize)
        h = LightConv(half, 1, name="light1", **kw)(x, train=train, momentum=momentum)
        h = LightConv(half, 3, name="light2", **kw)(h, train=train, momentum=momentum)
        h = LightConv(self.out_channels, 1, name="light3", **kw)(
            h, train=train, momentum=momentum
        )
        if self.in_channels != self.out_channels:
            # Biased 1x1 skip conv (nn.Conv2d default), only when needed.
            skip = _conv(
                self.out_channels, 1, "skip", bias=True, dtype=self.dtype,
                fan_in=self.in_channels,
            )(x)
        else:
            skip = x
        return h + skip


class Hourglass(nn.Module):
    """Loop-structured encoder/decoder (model/hourglass.py:55-89).

    ``n_modules`` chains that many ResUnits per slot — the preact analogue
    of the torch7 variant's CONFIG.nModules (the reference's hourglass.py
    has no such knob; 1 is the faithful default). Module 0 keeps the bare
    slot name so existing n_modules=1 checkpoints are unchanged."""

    channels: int
    compression_time: int = 4
    momentum: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None
    n_modules: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        kw = dict(momentum=self.momentum, dtype=self.dtype,
                  quantize=self.quantize)
        c = self.channels

        def chain(slot, h):
            for k in range(self.n_modules):
                name = slot if k == 0 else f"{slot}_m{k}"
                h = ResUnit(c, c, name=name, **kw)(h, train=train, momentum=momentum)
            return h

        skips = []
        h = x
        for t in range(self.compression_time):
            skips.append(chain(f"skip_{t}", h))
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = chain(f"down_{t}", h)

        h = chain("waist", h)

        for t, skip in zip(range(self.compression_time), reversed(skips)):
            h = chain(f"up_{t}", h)
            h = jnp.repeat(jnp.repeat(h, 2, axis=-3), 2, axis=-2)
            h = h + skip
        return h


class PrevHead(nn.Module):
    """ResUnit + light 1x1 (model/hourglass.py:115-119)."""

    channels: int
    momentum: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        kw = dict(momentum=self.momentum, dtype=self.dtype)
        h = ResUnit(self.channels, self.channels, name="res",
                    quantize=self.quantize, **kw)(
            x, train=train, momentum=momentum
        )
        # The 1x1 head conv stays float (heads are cheap; accuracy first).
        return LightConv(self.channels, 1, name="light", **kw)(
            h, train=train, momentum=momentum
        )


class StackedHourglass(nn.Module):
    """The full detector (model/hourglass.py:92-151).
    Input (B, 256, 256, 3) -> (S, B, 64, 64, J) per-stack heatmaps."""

    stacks: int = 8
    joints: int = 16
    out_channels: int = 256
    compression_time: int = 4
    momentum: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None  # "int8": eval/serving-only (ops/int8.py)
    n_modules: int = 1  # ResUnits per hourglass slot (torch7 CONFIG.nModules
    # analogue; the reference preact variant has no such knob, default 1)

    @nn.compact
    def __call__(self, x, *, train: bool = False, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        kw = dict(momentum=self.momentum, dtype=self.dtype)
        rkw = dict(quantize=self.quantize, **kw)
        x = x.astype(self.dtype)

        # Stem WITHOUT BN+ReLU after the 7x7 conv (model/hourglass.py:101-109).
        h = _conv(64, 7, "stem_conv", stride=2, dtype=self.dtype)(x)
        h = ResUnit(64, 128, name="stem_res1", **rkw)(h, train=train, momentum=momentum)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = ResUnit(128, 128, name="stem_res2", **rkw)(h, train=train, momentum=momentum)
        h = ResUnit(128, self.out_channels, name="stem_res3", **rkw)(
            h, train=train, momentum=momentum
        )

        heatmaps = []
        for i in range(self.stacks):
            prev_tensor = h
            h = Hourglass(
                self.out_channels, self.compression_time, self.momentum,
                self.dtype, self.quantize, self.n_modules, name=f"hg_{i}",
            )(h, train=train, momentum=momentum)
            h = PrevHead(self.out_channels, self.momentum, self.dtype,
                         self.quantize, name=f"prev_{i}")(
                h, train=train, momentum=momentum)
            skip_tensor = LightConv(self.out_channels, 1, name=f"skip_{i}", **kw)(
                h, train=train, momentum=momentum
            )
            pred = LightConv(self.joints, 1, bias=True, name=f"heatmap_{i}", **kw)(
                h, train=train, momentum=momentum
            )
            after = LightConv(self.out_channels, 1, name=f"after_{i}", **kw)(
                pred, train=train, momentum=momentum
            )
            h = after + skip_tensor + prev_tensor
            heatmaps.append(pred.astype(jnp.promote_types(jnp.float32, self.dtype)))

        return jnp.stack(heatmaps, axis=0)

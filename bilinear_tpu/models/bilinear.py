"""Bilinear residual lifting MLP — 2D keypoints (32-d) -> 3D pose (48-d).

TPU-native re-design of the reference BilinearUnit (model/bilinear.py:16-41):
Linear(32->1024) encoder block, two residual blocks (each two
Linear->BatchNorm->ReLU->Dropout(0.5) sub-blocks with an additive skip), and a
Linear(1024->48) decoder. 4.3 M params.

Differences from the reference are deliberate TPU idioms, not behavior
changes: channel-last dense layout, functional batch_stats, dropout driven by
explicit PRNG keys, and a compute dtype knob so the whole model can run
bfloat16 on the MXU with float32 parameters/statistics.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from bilinear_tpu.core.initializers import kaiming_normal, torch_bias_init
from bilinear_tpu.core.norm import TorchBatchNorm

NUM_JOINTS = 17 - 1  # reference: model/bilinear.py:20
IN_FEATURES = 2 * NUM_JOINTS  # 32
OUT_FEATURES = 3 * NUM_JOINTS  # 48


class HeavyLinear(nn.Module):
    """Linear -> BatchNorm1d -> ReLU -> Dropout(0.5)  (model/bilinear.py:7-13)."""

    features: int
    dropout: float = 0.5
    bn_momentum: Optional[float] = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum="__unset__"):
        if bn_momentum == "__unset__":
            bn_momentum = self.bn_momentum
        fan_in = x.shape[-1]
        x = nn.Dense(
            self.features,
            kernel_init=kaiming_normal(),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="linear",
        )(x)
        # BN statistics never run below f32 (bf16 compute keeps f32 stats);
        # promote rather than pin so float64 parity runs stay float64.
        bn_dtype = jnp.promote_types(jnp.float32, self.dtype)
        x = TorchBatchNorm(momentum=self.bn_momentum, dtype=bn_dtype, name="bn")(
            x.astype(bn_dtype), train=train, momentum=bn_momentum
        ).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class BilinearUnit(nn.Module):
    """The lifting network (model/bilinear.py:16-41)."""

    hidden: int = 1024
    num_blocks: int = 2
    dropout: float = 0.5
    bn_momentum: Optional[float] = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, bn_momentum="__unset__"):
        if bn_momentum == "__unset__":
            bn_momentum = self.bn_momentum
        x = x.astype(self.dtype)
        x = HeavyLinear(
            self.hidden, self.dropout, self.bn_momentum, self.dtype, name="encode"
        )(x, train=train, bn_momentum=bn_momentum)
        for b in range(self.num_blocks):
            skip = x
            for s in range(2):
                x = HeavyLinear(
                    self.hidden,
                    self.dropout,
                    self.bn_momentum,
                    self.dtype,
                    name=f"bilinear_{b}_{s}",
                )(x, train=train, bn_momentum=bn_momentum)
            x = x + skip
        x = nn.Dense(
            OUT_FEATURES,
            kernel_init=kaiming_normal(),
            bias_init=torch_bias_init(self.hidden),
            dtype=self.dtype,
            name="decode",
        )(x)
        return x.astype(jnp.promote_types(jnp.float32, self.dtype))

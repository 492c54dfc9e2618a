"""Shared conv building blocks for the hourglass model families.

One definition of the nn.Conv-mirroring contract (torch init formulas,
torch-style same padding, and the parameter-holder used by the int8 and
fused-kernel paths) so the preact (hourglass.py) and torch7
(hourglass_torch7.py) variants cannot drift apart — both must keep
checkpoint trees and param rng streams identical to nn.Conv's.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from bilinear_tpu.core.initializers import (
    torch_bias_init,
    torch_conv_default_kernel,
)


def conv2d(features, kernel, name, *, bias, stride=1, dtype=jnp.float32,
           fan_in=None):
    """nn.Conv with torch nn.Conv2d's defaults: (k-1)//2 'same' padding,
    kaiming-uniform kernel, uniform(+-1/sqrt(fan_in)) bias when ``fan_in``
    is given (torch's Conv2d bias init), zeros otherwise."""
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=pad,
        use_bias=bias,
        kernel_init=torch_conv_default_kernel(),
        bias_init=torch_bias_init(fan_in) if fan_in else nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class ConvParams(nn.Module):
    """Parameter holder mirroring nn.Conv's variable names/shapes/inits
    (optional bias, matching conv2d's bias/fan_in semantics), so the int8
    and fused-kernel paths' checkpoint trees are identical to the standard
    path's. Param rng streams match too: flax folds rngs by scope path, and
    within the scope kernel-then-bias is nn.Conv's declaration order."""

    kshape: tuple
    bias: bool = False
    fan_in: Optional[int] = None

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_conv_default_kernel(), self.kshape)
        b = None
        if self.bias:
            init = (torch_bias_init(self.fan_in) if self.fan_in
                    else nn.initializers.zeros)
            b = self.param("bias", init, (self.kshape[-1],))
        return kernel, b

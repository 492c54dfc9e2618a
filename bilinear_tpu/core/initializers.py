"""Torch-parity parameter initializers.

The reference initializes Linear weights with ``nn.init.kaiming_normal`` and
leaves everything else at torch defaults (reference: model/bilinear.py:86-90).
These initializers reproduce torch's distributions exactly (up to RNG stream)
so that training trajectories are statistically comparable.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_out(shape: tuple[int, ...]) -> tuple[int, int]:
    """Fan-in/fan-out for a JAX kernel.

    JAX Dense kernels are (in, out); conv kernels are (kh, kw, in, out)
    (NHWC/HWIO convention). This mirrors torch's _calculate_fan_in_and_fan_out
    on the transposed layout.
    """
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = math.prod(shape[:-2])
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_normal(a: float = 0.0, mode: str = "fan_in"):
    """torch.nn.init.kaiming_normal_ with leaky_relu nonlinearity (the torch
    default): std = sqrt(2 / (1 + a^2)) / sqrt(fan).

    Reference: model/bilinear.py:86-90 applies this to every Linear weight.
    """
    gain = math.sqrt(2.0 / (1.0 + a * a))

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_out(tuple(shape))
        fan = fan_in if mode == "fan_in" else fan_out
        std = gain / math.sqrt(fan)
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_linear_default_kernel():
    """torch nn.Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    (kaiming_uniform with a=sqrt(5) reduces to exactly this bound)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(tuple(shape))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    """torch nn.Linear / nn.Conv2d default bias init: U(-1/sqrt(fan_in), +...)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_default_kernel():
    """torch nn.Conv2d default weight init (kaiming_uniform a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = in_ch * kh * kw."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(tuple(shape))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init

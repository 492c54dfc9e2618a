"""BatchNorm with exact torch semantics, including cumulative-average mode.

The reference leans on two torch BatchNorm behaviors that flax's BatchNorm
does not reproduce:

1. torch updates running_var with the UNBIASED batch variance while
   normalizing with the biased one (flax uses biased for both).
2. ``momentum=None`` puts torch BN in *cumulative* moving-average mode
   (factor = 1/num_batches_tracked). The reference uses this for the
   hourglass re-implementation from scratch (model/hourglass.py:9) and for
   the eval-time BN-recalibration protocol of every model
   (reset_statistics: model/bilinear.py:43-55, model/hourglass.py:153-165;
   recalibration pass: valid_hourglass.py:23-48).

State lives in the 'batch_stats' collection as {mean, var, count}. Momentum
is a call-time argument so the same params can run in standard (0.1) or
cumulative (None) mode — that is how the recalibration protocol is expressed
functionally (see bilinear_tpu/eval/recalibrate.py).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing (channel) axis, torch-parity.

    Works for (B, C) inputs (BatchNorm1d) and (B, H, W, C) inputs
    (BatchNorm2d on NHWC — the TPU-native layout).
    """

    momentum: Optional[float] = 0.1  # None => cumulative (torch momentum=None)
    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, momentum: Optional[float] = "__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        features = x.shape[-1]
        axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, self.dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, self.dtype)
        )
        count = self.variable(
            "batch_stats", "count", lambda: jnp.zeros([], jnp.int32)
        )

        if train:
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)
            n = x.size // features
            unbiased = var * (n / max(n - 1, 1))
            new_count = count.value + 1
            if momentum is None:
                factor = 1.0 / new_count.astype(self.dtype)
            else:
                factor = jnp.asarray(momentum, self.dtype)
            if not self.is_initializing():
                ra_mean.value = (1 - factor) * ra_mean.value + factor * mean
                ra_var.value = (1 - factor) * ra_var.value + factor * unbiased
                count.value = new_count
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.use_scale:
            gamma = self.param("scale", nn.initializers.ones, (features,), self.dtype)
            y = y * gamma
        if self.use_bias:
            beta = self.param("bias", nn.initializers.zeros, (features,), self.dtype)
            y = y + beta
        return y


def reset_batch_stats(batch_stats):
    """Functional equivalent of the reference's ``reset_statistics()``
    (model/bilinear.py:43-55): zero every running mean, one every running var,
    zero every batch counter. The caller then re-estimates stats by running
    the model in train mode with momentum=None (cumulative)."""
    import jax

    def reset(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.zeros_like(leaf)
        if name == "var":
            return jnp.ones_like(leaf)
        if name == "count":
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(reset, batch_stats)

"""Training state pytree.

Mirrors the reference checkpoint contents {'epoch','step','state','optimizer'}
(train_bilinear.py:96-104) as a single functional pytree: params +
batch_stats (the torch ``state_dict``) and opt_state (the torch ``optimizer``
state), with the step counter carried on device so the whole
forward/backward/update/schedule program stays inside one XLA compilation.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32; the reference starts counting at 1

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation):
        state = cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.asarray(1, jnp.int32),
        )
        # De-alias: identical zero/one-initialized leaves (optimizer
        # accumulators, fresh BN stats) can share one deduped device buffer;
        # a donating train step would then "donate the same buffer twice"
        # (Execute() INVALID_ARGUMENT). One-time copy at creation; step
        # OUTPUTS are always distinct buffers, so only the initial state
        # needs this.
        return jax.tree.map(
            lambda a: a.copy() if isinstance(a, jax.Array) else a, state
        )

    def apply_updates(self, tx, grads):
        updates, opt_state = tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(params=params, opt_state=opt_state, step=self.step + 1)

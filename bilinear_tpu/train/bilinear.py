"""Bilinear lifting trainer — the whole epoch is ONE XLA program.

The reference's hot loop (train_bilinear.py:56-89) is host-bound: 8 worker
processes feed 64-sample batches to a 4.3 M-param MLP, so the GPU idles on
dataloader/launch overhead (SURVEY.md §3.1). The TPU-native design removes
the host entirely:

- the full normalized split lives in HBM (see data/h36m.py);
- each epoch = jitted [permute -> reshape -> lax.scan over steps], where one
  step = forward + MSE + backward + clip(1.0) + Adam + closed-form LR
  schedule + BN stats update, all fused by XLA;
- the trailing partial batch (DataLoader drop_last=False semantics) runs as a
  second, once-compiled program with its own static shape;
- the batch axis carries a 'data'-mesh sharding constraint, so the same
  program data-parallelizes over a pod slice (gradient all-reduce becomes an
  ICI psum inserted by XLA).

Protocol parity with train_bilinear.py: MSE loss (:78), grad-clip max-norm 1
(:81), Adam 1e-3 (model/bilinear.py:60), LR re-set at step 1 and every 100k
steps (:66-70), step starts at 1, 10 epochs per invocation, checkpoint per
epoch.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from bilinear_tpu.core.optim import bilinear_optimizer
from bilinear_tpu.core.state import TrainState
from bilinear_tpu.models.bilinear import BilinearUnit, IN_FEATURES
from bilinear_tpu.parallel import mesh as mesh_lib


class BilinearTrainer:
    def __init__(
        self,
        batch_size: int = 64,
        learning_rate: Optional[float] = None,  # None -> reference schedule
        mesh=None,
        dtype=jnp.float32,
        dropout: float = 0.5,
    ):
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = BilinearUnit(dtype=dtype, dropout=dropout)
        self.tx = bilinear_optimizer(learning_rate)
        self._epoch_fn = None
        self._epoch_shape = None
        self._tail_fn = None

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array) -> TrainState:
        variables = self.model.init(
            rng, jnp.zeros((2, IN_FEATURES), jnp.float32), train=False
        )
        return TrainState.create(
            variables["params"], variables["batch_stats"], self.tx
        )

    # ---------------------------------------------------------------- step
    def _train_step(self, state: TrainState, bx, by, rng):
        if self.mesh is not None:
            bx = mesh_lib.constrain_batch(bx, self.mesh)
            by = mesh_lib.constrain_batch(by, self.mesh)

        def loss_fn(params):
            out, mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                bx,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return jnp.mean(jnp.square(out - by)), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_updates(self.tx, grads).replace(batch_stats=new_stats)
        return state, loss

    # --------------------------------------------------------------- epoch
    def _build_epoch(self, n: int, dim_x: int, dim_y: int):
        bs = self.batch_size
        n_steps = n // bs

        # No donation here: the epoch program dispatches once per epoch, so
        # the state copy it would save is negligible, and restore_state-built
        # states can alias leaves (same shapes loaded from one buffer pool).
        @jax.jit
        def epoch_fn(state: TrainState, x, y, rng):
            perm_key, drop_key = jax.random.split(rng)
            perm = jax.random.permutation(perm_key, n)
            xs = jnp.take(x, perm[: n_steps * bs], axis=0).reshape(n_steps, bs, dim_x)
            ys = jnp.take(y, perm[: n_steps * bs], axis=0).reshape(n_steps, bs, dim_y)

            def body(state, batch):
                bx, by = batch
                step_rng = jax.random.fold_in(drop_key, state.step)
                state, loss = self._train_step(state, bx, by, step_rng)
                return state, loss

            state, losses = jax.lax.scan(body, state, (xs, ys))
            tail_idx = perm[n_steps * bs :]
            return state, losses, tail_idx

        return epoch_fn

    def _build_tail(self):
        # One jitted fn serves every tail size: jit specializes per shape.
        @jax.jit
        def tail_fn(state: TrainState, bx, by, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            return self._train_step(state, bx, by, step_rng)

        return tail_fn

    def train_epoch(
        self, state: TrainState, x, y, rng: jax.Array
    ) -> Tuple[TrainState, jnp.ndarray]:
        """Run one full epoch (including the trailing partial batch, matching
        DataLoader drop_last=False). Returns (state, per-step losses)."""
        n, dim_x = x.shape
        dim_y = y.shape[1]
        if self._epoch_fn is None or self._epoch_shape != (n, dim_x, dim_y):
            self._epoch_fn = self._build_epoch(n, dim_x, dim_y)
            self._epoch_shape = (n, dim_x, dim_y)
        state, losses, tail_idx = self._epoch_fn(state, x, y, rng)

        tail = n % self.batch_size
        if tail:
            if self._tail_fn is None:
                self._tail_fn = self._build_tail()
            bx = jnp.take(x, tail_idx, axis=0)
            by = jnp.take(y, tail_idx, axis=0)
            state, tail_loss = self._tail_fn(state, bx, by, rng)
            losses = jnp.concatenate([losses, tail_loss[None]])
        return state, losses

    # ---------------------------------------------------------- public API
    def fit(
        self,
        state: TrainState,
        x,
        y,
        epochs: int,
        rng: jax.Array,
        start_epoch: int = 0,
        on_epoch_end=None,
    ) -> TrainState:
        """Train ``epochs`` epochs (the reference driver runs 10 per
        invocation, bilinear.sh x40). ``on_epoch_end(epoch, state, losses)``
        is the checkpoint/logging hook; ``losses`` is the full per-step loss
        array for the epoch (one host fetch per epoch — the reference logged
        per step, train_bilinear.py:86, and so can the callback). A truthy
        return from the callback stops after that epoch (graceful
        preemption: the epoch is already checkpointed)."""
        for e in range(start_epoch + 1, start_epoch + epochs + 1):
            state, losses = self.train_epoch(state, x, y, jax.random.fold_in(rng, e))
            if on_epoch_end is not None and on_epoch_end(e, state, losses):
                break
        return state

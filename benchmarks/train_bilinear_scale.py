"""Training-throughput benchmark at the reference's scale: 1.56 M-sample
H36M-sized split, batch 64 (protocol parity) and batch 8192 (the TPU-native
operating point). Prints one JSON object per configuration.

The reference trains ~24 k DataLoader steps per epoch and is host-bound
(SURVEY.md §3.1); here the whole epoch is one XLA program.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.train.bilinear import BilinearTrainer

N = 1_559_744  # ~the reference train-split size


def bench(batch_size: int, epochs: int = 2) -> dict:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(N, 48).astype(np.float32))

    trainer = BilinearTrainer(batch_size=batch_size)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # Epoch 1: compile + run (not timed).
    state, losses = trainer.train_epoch(state, x, y, jax.random.PRNGKey(1))
    float(losses[-1])

    t0 = time.perf_counter()
    for e in range(epochs):
        state, losses = trainer.train_epoch(state, x, y, jax.random.PRNGKey(2 + e))
    final = float(losses[-1])  # fetch forces execution
    dt = (time.perf_counter() - t0) / epochs

    steps = -(-N // batch_size)
    return {
        "metric": "lifting_train_epoch",
        "batch_size": batch_size,
        "epoch_seconds": round(dt, 3),
        "steps_per_epoch": steps,
        "steps_per_sec": round(steps / dt, 1),
        "poses_per_sec": round(N / dt, 1),
        "final_loss": final,
    }


if __name__ == "__main__":
    for bs in (64, 8192):
        print(json.dumps(bench(bs)), flush=True)

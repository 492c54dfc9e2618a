"""Full-scale convergence run on TPU: the production bilinear configuration
(1024-hidden, dropout 0.5, Adam + reference LR schedule, batch 64) trained on
camera-projected synthetic poses with a known structure, reporting the MPJPE
trajectory. Demonstrates the whole train/eval stack converging at full model
size on real hardware. Prints one JSON object.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.data.camera import load_camera
from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.h36m_generate import write_gt_bins
from bilinear_tpu.eval.mpjpe import evaluate_mpjpe
from bilinear_tpu.train.bilinear import BilinearTrainer

CALIB = "/root/reference/calibration"
RANK = 20
N_TRAIN, N_VALID = 100_000, 8192


def manifold(n, seed, base, basis, noise=5.0):
    rng = np.random.RandomState(seed)
    z = rng.randn(n, RANK)
    s = base[None] + np.einsum("nr,rjd->njd", z, basis)
    s += rng.randn(*s.shape) * noise  # mm-scale annotation noise
    s[:, :, 2] += 5000.0
    return s.astype(np.float32)


def main():
    struct = np.random.RandomState(7)
    base = struct.randn(17, 3) * 150
    basis = struct.randn(RANK, 17, 3) * 60

    cam = load_camera(CALIB, "54138969")
    d = tempfile.mkdtemp()
    names = lambda n, t: [f"S1_Posing.54138969_{t}{i:07d}.jpg" for i in range(n)]
    write_gt_bins(
        d,
        {
            Task.Train: {"S": manifold(N_TRAIN, 0, base, basis),
                         "images": names(N_TRAIN, "t"), "camera": cam},
            Task.Valid: {"S": manifold(N_VALID, 1, base, basis),
                         "images": names(N_VALID, "v"), "camera": cam},
        },
    )
    splits = load_h36m(d, Protocol.GT)
    train, valid = splits[Task.Train], splits[Task.Valid]

    trainer = BilinearTrainer(batch_size=64)  # full production config
    state = trainer.init_state(jax.random.PRNGKey(0))
    x, y = jnp.asarray(train.part), jnp.asarray(train.s)

    def mpjpe(state):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, m = evaluate_mpjpe(trainer.model, variables, valid, chunk=8192)
        return m

    trajectory = {0: round(mpjpe(state), 2)}
    t0 = time.time()
    for e in range(1, 21):
        state, _ = trainer.train_epoch(
            state, x, y, jax.random.fold_in(jax.random.PRNGKey(1), e)
        )
        if e in (1, 5, 10, 20):
            trajectory[e] = round(mpjpe(state), 2)
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "bilinear_full_convergence",
                "model": "BilinearUnit(1024, dropout 0.5)",
                "samples": N_TRAIN,
                "mpjpe_by_epoch": trajectory,
                "train_wall_seconds_20_epochs": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

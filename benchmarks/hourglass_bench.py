"""Stacked-hourglass benchmark on one TPU chip: detector inference FPS
(256x256 frames, full 8-stack torch7 model) and fused train-step throughput.
Prints one JSON object per configuration.
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

from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.utils.profiling import measure_fn


def bench_inference(batch: int = 8, dtype=jnp.bfloat16) -> dict:
    model = MainModel(dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 256, 256, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    t = measure_fn(lambda eps: model.apply(v, x + eps, train=False)[-1], k1=2, k2=8)
    return {
        "metric": "hourglass_inference",
        "batch_size": batch,
        "dtype": str(dtype.__name__),
        "ms_per_batch": round(t * 1e3, 2),
        "fps": round(batch / t, 1),
    }


def bench_train_step(batch: int = 8, dtype=jnp.bfloat16) -> dict:
    from bilinear_tpu.train.hourglass import HourglassTrainer

    trainer = HourglassTrainer(batch_size=batch, dtype=dtype)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch_data = {
        "images": jnp.asarray(rng.rand(batch, 512, 512, 3).astype(np.float32)),
        "centers": jnp.asarray(np.full((batch, 2), 256.0, np.float32)),
        "scales": jnp.asarray(np.full((batch,), 1.0, np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(180, 330, (batch, 16, 2)).astype(np.float32)
        ),
        "valid": jnp.ones((batch, 16), bool),
    }
    # K steps inside one jit (lax.scan), K-differenced with adaptive sizing
    # (utils/profiling.measure_step_fn) so per-dispatch RTT cancels.
    from bilinear_tpu.utils.profiling import measure_step_fn

    dt = measure_step_fn(
        trainer._train_step, state, batch_data, jax.random.PRNGKey(1),
        k1=2, k2=10,
    )
    return {
        "metric": "hourglass_train_step",
        "batch_size": batch,
        "dtype": str(dtype.__name__),
        "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(batch / dt, 1),
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--train-batches", default="8",
                    help="comma-separated train-step batch sizes to sweep "
                         "(serving peaks at 16; training default is the "
                         "reference protocol's 8)")
    ap.add_argument("--skip-inference", action="store_true")
    args = ap.parse_args()
    if not args.skip_inference:
        print(json.dumps(bench_inference()), flush=True)
    for b in [int(s) for s in args.train_batches.split(",") if s]:
        print(json.dumps(bench_train_step(batch=b)), flush=True)

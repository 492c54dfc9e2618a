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
    # K steps inside one jit (lax.scan) and difference two K values so the
    # tunnel's per-dispatch RTT cancels (see utils/profiling.measure_fn).
    def multi(k):
        @jax.jit
        def run(state):
            def body(s, _):
                s, loss = trainer._train_step(s, batch_data, jax.random.PRNGKey(1))
                return s, loss

            s, losses = jax.lax.scan(body, state, None, length=k)
            return losses[-1]

        return run

    k1, k2 = 2, 10
    r1, r2 = multi(k1), multi(k2)
    float(r1(state))  # compile
    float(r2(state))

    def best(r):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(state))
            b = min(b, time.perf_counter() - t0)
        return b

    dt = (best(r2) - best(r1)) / (k2 - k1)
    return {
        "metric": "hourglass_train_step",
        "batch_size": batch,
        "dtype": str(dtype.__name__),
        "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(batch / dt, 1),
    }


if __name__ == "__main__":
    print(json.dumps(bench_inference()), flush=True)
    print(json.dumps(bench_train_step()), flush=True)

"""Detector serving batch-size sweep: bf16 eval forward FPS/MFU vs batch.

RESULTS.md quotes the reference-protocol batch 8 (2.72 ms, 2940 FPS, 64%
MFU). Serving is free to pick its own batch — End2EndServer pads requests
to compiled sizes (default {1, 8, 16}) — so this measures where the conv stack's
throughput actually peaks, on-chip, with the validated harness.

FLOPs: XLA cost analysis of the batch-8 eval forward is 342 GFLOP
(benchmarks/hourglass_mfu.py); convs scale linearly in batch, so
42.75 GFLOP/image at every size.

Usage (idle chip): python benchmarks/detector_serving_sweep.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.utils.profiling import measure_fn, mix

GFLOP_PER_IMAGE = 342.0 / 8.0
PEAK_BF16 = 197e12  # v5e bf16 MXU peak


def main() -> None:
    rng = jax.random.PRNGKey(0)
    model = MainModel(dtype=jnp.bfloat16)
    variables = model.init(
        rng, jax.random.uniform(rng, (1, 256, 256, 3), jnp.float32),
        train=False,
    )

    for batch in (1, 8, 16, 32, 64):
        x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32)

        def fwd(x):
            return model.apply(variables, x, train=False)

        t = measure_fn(lambda eps: fwd(mix(x, eps)), k1=2, k2=10)
        tflops = batch * GFLOP_PER_IMAGE / t / 1e3
        print(json.dumps({
            "metric": "detector_eval_fwd",
            "batch": batch,
            "ms": round(t * 1e3, 3),
            "fps": round(batch / t, 1),
            "tflops": round(tflops, 1),
            "mfu": round(tflops * 1e12 / PEAK_BF16, 3),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Int8-quantized hourglass serving vs the bf16 path, on-chip.

Measures, at reference architecture (8 stacks, 256 features, depth 4):
- detector eval forward (batch 8): bf16 vs quantize="int8";
- fused End2End program (batch 1 webcam, batch 8 serving): bf16 vs int8,
  per-dispatch trace latency + K-differenced throughput.

The bf16 eval forward runs at ~64% MFU (benchmarks/RESULTS.md), so the
remaining serving lever is the int8 MXU (~2x MACs/cycle on v5e) — the same
reasoning that gave the lifting path 1.63x (ops/pallas/lifting_int8.py).
The dynamic-quantization overhead here is per-conv (quantize weights +
per-sample activations on the VPU), so the realized win is expected below
2x; this script measures what it actually is.

Usage (on the TPU, chip otherwise idle): python benchmarks/hourglass_int8_bench.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bilinear_tpu.models.end2end import End2End
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.utils.profiling import measure_fn, mix, trace_per_dispatch

FWD_GFLOP_B8 = 342.0  # XLA cost analysis of the bf16 batch-8 eval forward


def bench_detector(batch: int = 8):
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32)
    variables = MainModel(dtype=jnp.bfloat16).init(rng, x[:1], train=False)

    out = {}
    for mode, quantize in (("bf16", None), ("int8", "int8")):
        model = MainModel(dtype=jnp.bfloat16, quantize=quantize)

        def fwd(x):
            return model.apply(variables, x, train=False)

        t = measure_fn(lambda eps: fwd(mix(x, eps)), k1=2, k2=10)
        out[mode] = t
        print(json.dumps({
            "metric": "hourglass_eval_fwd",
            "mode": mode,
            "batch": batch,
            "ms": round(t * 1e3, 3),
            "fps": round(batch / t, 1),
            "effective_tops": round(FWD_GFLOP_B8 / t / 1e3, 1),
        }), flush=True)
    print(json.dumps({
        "metric": "hourglass_eval_fwd_speedup",
        "int8_vs_bf16": round(out["bf16"] / out["int8"], 3),
    }), flush=True)


def bench_end2end(batch: int):
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32)
    centers = jnp.full((batch, 2), 128.0)
    scales = jnp.full((batch,), 1.28)
    mean_p, std_p = jnp.zeros(32), jnp.ones(32)
    variables = End2End(dtype=jnp.bfloat16).init(
        rng, x[:1], centers[:1], scales[:1], mean_p, std_p, train=False
    )

    for mode, quantize in (("bf16", None), ("int8", "int8")):
        model = End2End(dtype=jnp.bfloat16, quantize=quantize)

        def fwd(x):
            return model.apply(
                variables, x, centers, scales, mean_p, std_p, train=False
            )

        compiled = jax.jit(fwd)
        float(jnp.sum(compiled(x)[2].astype(jnp.float32)))  # compile
        lat, _ = trace_per_dispatch(lambda: compiled(x), k=16)
        t = measure_fn(lambda eps: fwd(mix(x, eps))[2], k1=2, k2=10)
        print(json.dumps({
            "metric": "end2end_fused",
            "mode": mode,
            "batch": batch,
            "trace_latency_ms": None if lat is None else round(lat * 1e3, 3),
            "throughput_ms_per_batch": round(t * 1e3, 3),
            "fps": round(batch / t, 1),
        }), flush=True)


def main():
    bench_detector(8)
    for batch in (1, 8):
        bench_end2end(batch)


if __name__ == "__main__":
    main()

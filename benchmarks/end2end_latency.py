"""Serving latency of the fused end-to-end program (hourglass -> softargmax
-> joint remap -> normalize -> lifting, ONE XLA program): per-dispatch
latency and throughput at webcam batch 1 and serving batch 8/64.

The reference's online composition is broken (model/end2end.py, webcam.py —
SURVEY.md §2.3); its offline chain ran two separate processes. Here the
whole frame->3D-pose chain is a single device program, so "latency" is one
dispatch.

Timing: per-dispatch latency comes from the device-plane xplane trace
(true executable duration, excludes the tunnel RTT a colocated client
would not pay); throughput from the K-differenced harness.

Usage (on the TPU): python benchmarks/end2end_latency.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.models.end2end import End2End
from bilinear_tpu.utils.profiling import measure_fn, mix, trace_per_dispatch


def trace_latency(fn, arg, k: int = 16):
    """Mean per-dispatch executable duration from the device plane, via the
    shared utils/profiling.trace_per_dispatch parser."""
    compiled = jax.jit(fn)
    float(jnp.sum(compiled(arg)[2].astype(jnp.float32)))  # compile
    sec, _info = trace_per_dispatch(lambda: compiled(arg), k=k)
    return sec


def main():
    model = End2End(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    mean_p = jnp.zeros(32)
    std_p = jnp.ones(32)

    def build(batch):
        x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32)
        centers = jnp.full((batch, 2), 128.0)
        scales = jnp.full((batch,), 1.28)
        variables = model.init(rng, x[:1], centers[:1], scales[:1],
                               mean_p, std_p, train=False)

        def fwd(x):
            return model.apply(
                variables, x, centers, scales, mean_p, std_p, train=False
            )

        return fwd, x

    for batch in (1, 8, 64):
        fwd, x = build(batch)
        lat = trace_latency(fwd, x)
        t = measure_fn(lambda eps: fwd(mix(x, eps))[2], k1=2, k2=10)
        print(json.dumps({
            "metric": "end2end_fused",
            "batch": batch,
            "trace_latency_ms": None if lat is None else round(lat * 1e3, 3),
            "throughput_ms_per_batch": round(t * 1e3, 3),
            "fps": round(batch / t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

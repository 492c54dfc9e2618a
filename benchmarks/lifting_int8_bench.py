"""On-chip throughput: int8-quantized lifting kernel vs the bf16 kernel.

The bf16 kernel sits at ~90% of the v5e bf16 MXU peak (RESULTS.md), so the
only remaining lever for the headline lifting-serving path is the int8 MXU
(~2x MACs/cycle). Same differenced fori-loop method as bench.py (this
platform: version-dependent block_until_ready semantics, ~25 ms RTT —
differenced scalar-fetch loops are correct regardless).

Usage: python benchmarks/lifting_int8_bench.py  (on the TPU)
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 65_536
K1, K2 = 4, 24
FLOP_PER_POSE = 2 * (32 * 1024 + 4 * 1024 * 1024 + 1024 * 48)


def _timed_scalar(fn, *args, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _throughput(forward, x) -> float:
    def loop(k):
        @jax.jit
        def run(x):
            def body(_, acc):
                out = forward(x + acc * 1e-38)
                return jnp.sum(out) * 1e-6

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    run1, run2 = loop(K1), loop(K2)
    x = jax.device_put(x)
    float(run1(x))
    float(run2(x))
    t1 = _timed_scalar(run1, x)
    t2 = _timed_scalar(run2, x)
    return BATCH / ((t2 - t1) / (K2 - K1))


def main() -> None:
    from bilinear_tpu.models.bilinear import BilinearUnit
    from bilinear_tpu.ops.pallas.lifting import lifting_forward, prepare_weights
    from bilinear_tpu.ops.pallas.lifting_int8 import (
        lifting_forward_int8,
        prepare_weights_int8,
    )

    model = BilinearUnit(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 32), jnp.float32)
    variables = model.init(rng, x[:2], train=False)
    params, stats = variables["params"], variables["batch_stats"]

    prep_bf16 = prepare_weights(params, stats, jnp.bfloat16)
    prep_int8 = prepare_weights_int8(params, stats)

    results = {}
    for name, fwd in (
        ("bf16_kernel", lambda x: lifting_forward(
            params, stats, x, prepared=prep_bf16)),
        ("int8_kernel", lambda x: lifting_forward_int8(
            x=x, prepared=prep_int8, backend="pallas")),
        ("int8_xla", lambda x: lifting_forward_int8(
            x=x, prepared=prep_int8, backend="xla")),
    ):
        try:
            pps = _throughput(fwd, x)
            results[name] = pps
            print(json.dumps({
                "metric": f"lifting_{name}_poses_per_sec",
                "value": round(pps, 1),
                "tflops": round(pps * FLOP_PER_POSE / 1e12, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "metric": f"lifting_{name}", "error": str(e)[-400:]
            }), flush=True)

    if "bf16_kernel" in results and "int8_kernel" in results:
        print(json.dumps({
            "metric": "int8_speedup_vs_bf16",
            "value": round(results["int8_kernel"] / results["bf16_kernel"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()

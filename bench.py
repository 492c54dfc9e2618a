"""Benchmark: batched 2D->3D lifting inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation's lifting throughput — the torch-CPU
BilinearUnit eval forward, measured in this image at 10_100 poses/sec
(1-thread torch 2.13 CPU, batch 8192; re-measure with --measure-baseline).
The BASELINE.json north-star target is >=10x that per chip.

Timing method: the tunneled TPU platform here does not synchronize on
block_until_ready — only a host fetch forces execution — and carries a
~25 ms RTT per fetch. So we jit K forward passes in a fori_loop ending in a
scalar fetch, time two different K, and difference them: per-pass time is
(t_K2 - t_K1)/(K2 - K1), with the RTT and dispatch overhead cancelled.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

TORCH_CPU_BASELINE_POSES_PER_SEC = 10_100.0
BATCH = 65_536
K1, K2 = 4, 24


def measure_baseline() -> float:
    sys.path.insert(0, "/root/reference")
    import torch
    from model import bilinear as ref

    m = ref.BilinearUnit()
    m.eval()
    x = torch.randn(8192, 32)
    with torch.no_grad():
        for _ in range(3):
            m(x)
        t0 = time.time()
        for _ in range(10):
            m(x)
        dt = time.time() - t0
    return 8192 * 10 / dt


def _timed_scalar(fn, *args, reps: int = 3) -> float:
    """Min wall time of float(fn(*args)) over reps (fetch forces execution)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    if "--measure-baseline" in sys.argv:
        print(json.dumps({"torch_cpu_poses_per_sec": measure_baseline()}))
        return

    from bilinear_tpu.models.bilinear import BilinearUnit
    from bilinear_tpu.ops.pallas.lifting import lifting_forward, prepare_weights

    model = BilinearUnit(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 32), jnp.float32)
    variables = model.init(rng, x[:2], train=False)
    prepared = prepare_weights(
        variables["params"], variables["batch_stats"], jnp.bfloat16
    )

    def forward(x):
        # Production inference path: the fused Pallas kernel (whole network
        # VMEM-resident, BN folded). ~5% over the XLA program, both near MXU
        # peak.
        return lifting_forward(
            variables["params"], variables["batch_stats"], x, prepared=prepared
        )

    def loop(k):
        @jax.jit
        def run(x):
            def body(_, acc):
                # acc feeds back into the input so iterations cannot be
                # hoisted or deduplicated by the compiler.
                out = forward(x + acc * 1e-38)
                return jnp.sum(out) * 1e-6

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    run1, run2 = loop(K1), loop(K2)
    x = jax.device_put(x)
    float(run1(x))  # compile
    float(run2(x))

    t1 = _timed_scalar(run1, x)
    t2 = _timed_scalar(run2, x)
    per_pass = (t2 - t1) / (K2 - K1)

    poses_per_sec = BATCH / per_pass
    print(
        json.dumps(
            {
                "metric": "lifting_inference_throughput",
                "value": round(poses_per_sec, 1),
                "unit": "poses/sec/chip",
                "vs_baseline": round(
                    poses_per_sec / TORCH_CPU_BASELINE_POSES_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

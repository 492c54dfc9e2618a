"""Benchmark: the framework's headline numbers on one TPU chip.

Line 1 (the line the driver parses): batched 2D->3D lifting inference
throughput, {"metric", "value", "unit", "vs_baseline"} — the exact (bf16)
serving path.
Line 2: int8-quantized lifting serving throughput (accuracy-gated).
Line 3: calibrated static-scale int8 lifting throughput (the fastest
        shipped serving mode — per-layer activation scales baked in as
        compile-time constants).
Line 4: hourglass fused train step (batch 8 bf16) ms/step + MFU.
Line 5: end-to-end fused frame->3D program, batch-1 dispatch latency.
Extra lines are failure-isolated: any error there prints a diagnostic line
without touching line 1.

Baseline: the reference implementation's lifting throughput — the torch-CPU
BilinearUnit eval forward, measured in this image at 10_100 poses/sec
(1-thread torch 2.13 CPU, batch 8192; re-measure with --measure-baseline).
The BASELINE.json north-star target is >=10x that per chip.

Timing method: the tunneled TPU platform's block_until_ready semantics are
version-dependent (probe with cli.doctor) — a host fetch always forces
execution — and each fetch carries a
~25 ms RTT. So we jit K forward passes in a fori_loop ending in a
scalar fetch, time two different K, and difference them: per-pass time is
(t_K2 - t_K1)/(K2 - K1), with the RTT and dispatch overhead cancelled
(utils/profiling.py::measure_fn / measure_step_fn).
"""
from __future__ import annotations

import json
import os
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


def _differenced_throughput(forward, x) -> float:
    """Poses/sec of forward(x) via the vetted harness (profiling.measure_fn:
    differenced jitted loops ending in a scalar fetch, adaptive loop sizing
    against tunnel-RTT jitter, amortized fallback under chip contention).
    ``mix`` — not a bare ``x + eps`` — because the network's first encode
    matmul is linear in x and the algebraic simplifier would hoist it."""
    from bilinear_tpu.utils.profiling import measure_fn, mix

    x = jax.device_put(x)
    return BATCH / measure_fn(lambda eps: forward(mix(x, eps)), k1=K1, k2=K2)


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

    poses_per_sec = _differenced_throughput(forward, x)
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
        ),
        flush=True,
    )

    if "--lifting-only" in sys.argv:
        return
    for extra in (bench_lifting_int8, bench_lifting_int8_static,
                  bench_hourglass_step, bench_end2end_latency):
        try:
            extra()
        except Exception as e:  # never let extras break line 1's contract
            print(
                json.dumps({"metric": extra.__name__, "error": str(e)[-300:]}),
                flush=True,
            )


def bench_lifting_int8() -> None:
    """Int8-quantized lifting serving (ops/pallas/lifting_int8.py): dynamic
    per-tile activation + per-channel weight int8 on the MXU. Accuracy-gated
    (tests/test_lifting_int8.py: MPJPE moves <0.5%); measured 1.63x the bf16
    kernel on-chip (289 TOPS). Line 1 stays the exact bf16 path — this line
    is the quantized-serving headline."""
    from bilinear_tpu.models.bilinear import BilinearUnit
    from bilinear_tpu.ops.pallas.lifting_int8 import (
        lifting_forward_int8,
        prepare_weights_int8,
    )

    model = BilinearUnit(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 32), jnp.float32)
    variables = model.init(rng, x[:2], train=False)
    prepared = prepare_weights_int8(
        variables["params"], variables["batch_stats"]
    )

    pps = _differenced_throughput(
        lambda x: lifting_forward_int8(x=x, prepared=prepared), x
    )
    print(
        json.dumps(
            {
                "metric": "lifting_int8_inference_throughput",
                "value": round(pps, 1),
                "unit": "poses/sec/chip (int8-quantized serving)",
                "vs_baseline": round(
                    pps / TORCH_CPU_BASELINE_POSES_PER_SEC, 2
                ),
            }
        ),
        flush=True,
    )


def bench_lifting_int8_static() -> None:
    """Calibrated static-scale int8 lifting (LiftingServer
    quantize="int8-static"): per-layer activation scales measured on a
    calibration batch and baked in as compile-time constants, removing the
    per-tile amax reduce and enabling 1024-row tiles. Measured 38.0 M
    poses/sec on-chip — within ~2% of the kernel's MXU-bound ceiling
    (benchmarks/int8_scale_probe.py)."""
    from bilinear_tpu.models.bilinear import BilinearUnit
    from bilinear_tpu.ops.pallas.lifting_int8 import (
        calibrate_scales,
        lifting_forward_int8,
        prepare_weights_int8,
    )

    model = BilinearUnit(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 32), jnp.float32)
    variables = model.init(rng, x[:2], train=False)
    prepared = prepare_weights_int8(
        variables["params"], variables["batch_stats"]
    )
    scales = calibrate_scales(prepared, x[:8192])

    pps = _differenced_throughput(
        lambda x: lifting_forward_int8(
            x=x, prepared=prepared, static_scales=scales
        ),
        x,
    )
    print(
        json.dumps(
            {
                "metric": "lifting_int8_static_inference_throughput",
                "value": round(pps, 1),
                "unit": "poses/sec/chip (calibrated static-scale int8)",
                "vs_baseline": round(
                    pps / TORCH_CPU_BASELINE_POSES_PER_SEC, 2
                ),
            }
        ),
        flush=True,
    )


HOURGLASS_STEP_GFLOP_FALLBACK = 1021.0  # XLA cost analysis, bf16 batch 8
# (benchmarks/RESULTS.md MFU table); recomputed live when the CPU lowering
# subprocess succeeds.
PEAK_BF16 = 197e12  # TPU v5e bf16 MXU peak


def bench_hourglass_step() -> None:
    """Fused hourglass train step (preprocess + fwd/bwd + clip + RMSprop),
    reference protocol batch 8, bf16 — the number that characterizes
    detector training (/root/reference/train_hourglass.py:63-95)."""
    import numpy as np

    from bilinear_tpu.train.hourglass import HourglassTrainer
    from bilinear_tpu.utils.profiling import measure_step_fn

    batch = 8
    trainer = HourglassTrainer(batch_size=batch, dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    bd = dict(
        images=jnp.asarray(rng.rand(batch, 512, 512, 3).astype(np.float32)),
        centers=jnp.asarray(np.full((batch, 2), 256.0, np.float32)),
        scales=jnp.asarray(np.full((batch,), 1.0, np.float32)),
        keypoints=jnp.asarray(
            rng.uniform(180, 330, (batch, 16, 2)).astype(np.float32)
        ),
        valid=jnp.ones((batch, 16), bool),
    )
    t = measure_step_fn(
        trainer._train_step, state, bd, jax.random.PRNGKey(1), k1=2, k2=8
    )

    gflop = HOURGLASS_STEP_GFLOP_FALLBACK
    flops_live = False
    try:  # live HLO FLOP count (CPU lowering subprocess; slow on 1-core box)
        repo = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(repo, "benchmarks"))
        import hourglass_mfu

        gflop = hourglass_mfu.hlo_flops(batch, "bfloat16", False, repo)[
            "step_flops"
        ] / 1e9
        flops_live = True
    except Exception:
        pass

    mfu = gflop * 1e9 / t / PEAK_BF16
    print(
        json.dumps(
            {
                "metric": "hourglass_train_step_ms",
                "value": round(t * 1e3, 2),
                "unit": "ms (batch 8, bf16, fused step)",
                "images_per_sec": round(batch / t, 1),
                "step_gflop": round(gflop, 1),
                "step_gflop_live": flops_live,
                "mfu": round(mfu, 3),
            }
        ),
        flush=True,
    )


def bench_end2end_latency() -> None:
    """Batch-1 dispatch latency of the fused frame->3D program (the webcam
    path the reference sketches but cannot run, model/end2end.py:21-43)."""
    from bilinear_tpu.models.end2end import End2End
    from bilinear_tpu.utils.profiling import measure_fn, mix, trace_per_dispatch

    model = End2End(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    mean_p, std_p = jnp.zeros(32), jnp.ones(32)
    x = jax.random.uniform(rng, (1, 256, 256, 3), jnp.float32)
    centers = jnp.full((1, 2), 128.0)
    scales = jnp.full((1,), 1.28)
    variables = model.init(rng, x, centers, scales, mean_p, std_p, train=False)

    def fwd(x):
        return model.apply(
            variables, x, centers, scales, mean_p, std_p, train=False
        )

    compiled = jax.jit(fwd)
    float(jnp.sum(compiled(x)[2].astype(jnp.float32)))  # compile
    lat, _info = trace_per_dispatch(lambda: compiled(x), k=16)
    t = measure_fn(lambda eps: fwd(mix(x, eps))[2], k1=2, k2=10)
    print(
        json.dumps(
            {
                "metric": "end2end_b1_latency_ms",
                "value": None if lat is None else round(lat * 1e3, 3),
                "unit": "ms (device-plane trace, batch 1)",
                "throughput_ms": round(t * 1e3, 3),
                "fps": round(1.0 / t, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

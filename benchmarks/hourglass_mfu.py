"""Hourglass MFU accounting: FLOPs/step from the compiled HLO, achieved
TFLOP/s, and model-FLOPs-utilization for f32/bf16 at the reference batch and
at a remat-enabled large batch.

FLOP counts come from XLA's own cost analysis of the lowered program,
computed in a CPU subprocess (the count is a property of the HLO — matmul
and convolution FLOPs are identical across backends; the tunneled 'axon'
platform compiles service-side and exposes no cost analysis). Timings use
the RTT-cancelling K-differenced harness (utils/profiling rules).

MFU denominator: TPU v5 lite peak is 197 TFLOP/s in bf16 (the MXU path our
bf16 configs hit). f32 rows report achieved TFLOP/s without an MFU claim —
f32 convolutions lower to a different MXU recipe whose peak is not public.

Reference cost facts this quantifies: the 8-stack/256-feature/depth-4 model
of /root/reference/model/hourglass_torch7.py:6-11 trained at batch 8
(util/config.py:7).

Usage (on the TPU):
  python benchmarks/hourglass_mfu.py                 # full table
  python benchmarks/hourglass_mfu.py --quick         # bf16 batch 8 only
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # TPU v5e peak, bf16 MXU

_FLOPS_CHILD = r"""
import json, sys
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from bilinear_tpu.train.hourglass import HourglassTrainer

batch, dtype_s, remat = {batch}, {dtype!r}, {remat}
dtype = jnp.bfloat16 if dtype_s == 'bfloat16' else jnp.float32
trainer = HourglassTrainer(batch_size=batch, dtype=dtype, remat=remat)
state = trainer.init_state(jax.random.PRNGKey(0))
bd = dict(
    images=jnp.zeros((batch, 512, 512, 3), jnp.float32),
    centers=jnp.full((batch, 2), 256.0),
    scales=jnp.full((batch,), 1.0),
    keypoints=jnp.full((batch, 16, 2), 256.0),
    valid=jnp.ones((batch, 16), bool),
)
# Whole fused train step (preprocess + fwd/bwd + RMSprop), and fwd alone.
lowered = jax.jit(trainer._train_step).lower(state, bd, jax.random.PRNGKey(1))
step_cost = lowered.compile().cost_analysis()
xin = jnp.zeros((batch, 256, 256, 3), jnp.float32)
v = {{'params': state.params, 'batch_stats': state.batch_stats}}
fwd = jax.jit(lambda v, x: trainer.model.apply(v, x, train=False)[-1])
fwd_cost = fwd.lower(v, xin).compile().cost_analysis()
print(json.dumps({{'step_flops': step_cost['flops'],
                   'fwd_flops': fwd_cost['flops']}}))
"""


def hlo_flops(batch: int, dtype: str, remat: bool, repo: str) -> dict:
    code = _FLOPS_CHILD.format(repo=repo, batch=batch, dtype=dtype, remat=remat)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"flops child failed:\n{out.stderr[-4000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def time_step(batch: int, dtype: str, remat: bool) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bilinear_tpu.train.hourglass import HourglassTrainer

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    trainer = HourglassTrainer(batch_size=batch, dtype=dt, remat=remat)
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

    from bilinear_tpu.utils.profiling import measure_step_fn

    return measure_step_fn(
        trainer._train_step, state, bd, jax.random.PRNGKey(1), k1=2, k2=8
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--flops-only", action="store_true",
                   help="print HLO FLOP counts and exit (no device timing)")
    args = p.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = [("bfloat16", 8, False)]
    if not args.quick:
        configs += [("float32", 8, False), ("bfloat16", 32, True)]

    for dtype, batch, remat in configs:
        flops = hlo_flops(batch, dtype, remat, repo)
        # MFU counts MODEL flops; the remat program's HLO contains the
        # recompute, so fetch the non-remat count for the numerator and
        # report the remat HLO count separately as hardware flops.
        model_flops = (
            hlo_flops(batch, dtype, False, repo)["step_flops"]
            if remat
            else flops["step_flops"]
        )
        row = {
            "metric": "hourglass_mfu",
            "dtype": dtype,
            "batch_size": batch,
            "remat": remat,
            "step_gflops": round(model_flops / 1e9, 1),
            "hw_step_gflops": round(flops["step_flops"] / 1e9, 1),
            "fwd_gflops": round(flops["fwd_flops"] / 1e9, 1),
        }
        if not args.flops_only:
            t = time_step(batch, dtype, remat)
            achieved_model = model_flops / t
            row.update(
                ms_per_step=round(t * 1e3, 2),
                images_per_sec=round(batch / t, 1),
                achieved_tflops=round(achieved_model / 1e12, 1),
                hw_tflops=round(flops["step_flops"] / t / 1e12, 1),
                mfu=round(achieved_model / PEAK_BF16, 3)
                if dtype == "bfloat16"
                else None,
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

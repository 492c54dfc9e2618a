"""TPU probe for the fused bottleneck-residual kernels: compile the single
block at the hourglass's dominant shapes, check numerics against the XLA
ResModule on-device, and micro-benchmark fwd+bwd both ways.

Run (TPU): python benchmarks/fused_block_probe.py [--shape B H W CI CO]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.models.hourglass_torch7 import MainModel, ResModule
from bilinear_tpu.utils.profiling import measure_fn, mix


def run_shape(b, h, w, ci, co, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, ci).astype(np.float32))
    probe = jnp.asarray(rng.randn(b, h, w, co).astype(np.float32))

    std = ResModule(ci, co, dtype=dtype)
    fused = ResModule(ci, co, dtype=dtype, fused=True)
    variables = std.init(jax.random.PRNGKey(0), x, train=False)

    def loss(module):
        def fn(params, x):
            out, _ = module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) * probe)
        return fn

    grad_std = jax.jit(jax.value_and_grad(loss(std)))
    grad_fused = jax.jit(jax.value_and_grad(loss(fused)))

    t0 = time.time()
    ls, gs = grad_std(variables["params"], x)
    ls = float(ls)
    print(f"  std compile+run {time.time()-t0:.1f}s loss={ls:.4f}", flush=True)
    t0 = time.time()
    lf, gf = grad_fused(variables["params"], x)
    lf = float(lf)
    print(f"  fused compile+run {time.time()-t0:.1f}s loss={lf:.4f}", flush=True)

    rel = abs(ls - lf) / max(abs(ls), 1e-8)
    gs_flat = jax.tree.leaves(gs)
    gf_flat = jax.tree.leaves(gf)
    grels = []
    for a, b_ in zip(gs_flat, gf_flat):
        an = np.asarray(a, np.float32)
        bn_ = np.asarray(b_, np.float32)
        denom = max(float(np.abs(an).max()), 1e-6)
        grels.append(float(np.abs(an - bn_).max()) / denom)
    print(f"  loss rel diff {rel:.2e}; worst grad rel {max(grels):.2e}",
          flush=True)

    def consume(vg):
        """Timed fns must consume loss AND all gradients — fetching only the
        loss lets XLA dead-code-eliminate the entire backward pass."""
        val, grads = vg
        return val + sum(
            jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads)
        )

    t_std = measure_fn(
        lambda eps: consume(grad_std(variables["params"], mix(x, eps))),
        k1=2, k2=10,
    )
    t_fused = measure_fn(
        lambda eps: consume(grad_fused(variables["params"], mix(x, eps))),
        k1=2, k2=10,
    )
    print(json.dumps({
        "shape": [b, h, w, ci, co],
        "xla_ms": round(t_std * 1e3, 3),
        "fused_ms": round(t_fused * 1e3, 3),
        "speedup": round(t_std / t_fused, 2),
        "loss_rel": rel,
        "grad_rel_max": max(grels),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", nargs=5, type=int, default=None)
    args = p.parse_args()
    shapes = (
        [tuple(args.shape)] if args.shape else
        [
            (8, 16, 16, 64, 64),      # tiny smoke (fast compile)
            (8, 64, 64, 256, 256),    # dominant body block
            (8, 32, 32, 256, 256),    # second-most traffic
            (8, 64, 64, 128, 256),    # stem_res3 (skip variant)
        ]
    )
    for s in shapes:
        print(f"shape {s}:", flush=True)
        run_shape(*s)


if __name__ == "__main__":
    main()

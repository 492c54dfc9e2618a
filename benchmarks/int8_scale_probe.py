"""Where does the int8 lifting kernel's missing 27% of peak go?

RESULTS.md records the dynamic-int8 Pallas kernel at 289 TOPS = 73% of the
v5e int8 MXU peak. Static accounting says the per-layer VPU work — the
dynamic amax reduce plus round/clip/cast on the way in and the f32
dequant+bias+relu on the way out, ~6 elementwise passes over each 512x1024
activation tile per hidden layer — costs the same order of time as the
layer's 5.4 us MXU dot if the two units do not overlap. This probe measures
that hypothesis instead of asserting it, the same way round 3 treated the
conv-fusion hypothesis:

1. dynamic   — the production kernel (per-tile amax), tile sweep 256/512/1024;
2. fixed     — identical kernel with the activation scale baked in as a
               constant (what a calibrated static-quantization mode would
               run): removes ONLY the amax reduce;
3. mxu-bound — int8 chain with raw truncating casts between layers and no
               scale math at all (numerically meaningless, structurally
               identical): the kernel's MXU + minimal-VPU ceiling.

poses/sec via the same adaptive K-differenced method as bench.py. Run on
the real chip: python benchmarks/int8_scale_probe.py
"""
from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.ops.pallas.lifting import HIDDEN, IN_F, OUT_F
from bilinear_tpu.ops.pallas.lifting_int8 import (
    _flatten,
    _kernel,
    calibrate_scales,
    lifting_forward_int8,
    prepare_weights_int8,
)
from bilinear_tpu.utils.profiling import adaptive_diff

BATCH = 65_536
FIXED_SCALE = 0.05  # representative |h|max/127 for unit-normal inputs


def _quant_dot_fixed(h, wq, ws, b):
    hq = jnp.clip(jnp.round(h * (1.0 / FIXED_SCALE)), -127, 127).astype(
        jnp.int8
    )
    acc = jax.lax.dot_general(
        hq, wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (FIXED_SCALE * ws)[None, :] + b[None, :]
    return jnp.maximum(y, 0.0)


def _kernel_fixed(x_ref, enc_w, enc_b,
                  w0, s0, b0, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                  dec_w, dec_b, out_ref):
    h = jnp.dot(
        x_ref[:], enc_w[:], preferred_element_type=jnp.float32
    ) + enc_b[:]
    h = jnp.maximum(h, 0.0)
    skip = h
    h = _quant_dot_fixed(h, w0[:], s0[:], b0[:])
    h = _quant_dot_fixed(h, w1[:], s1[:], b1[:])
    h = h + skip
    skip = h
    h = _quant_dot_fixed(h, w2[:], s2[:], b2[:])
    h = _quant_dot_fixed(h, w3[:], s3[:], b3[:])
    h = h + skip
    out_ref[:] = jnp.dot(
        h.astype(jnp.bfloat16), dec_w[:], preferred_element_type=jnp.float32
    ) + dec_b[:]


def _kernel_mxu(x_ref, enc_w, enc_b,
                w0, s0, b0, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                dec_w, dec_b, out_ref):
    # Perf skeleton only: truncating int32->int8 casts, no scale math.
    h = jnp.dot(
        x_ref[:], enc_w[:], preferred_element_type=jnp.float32
    ) + enc_b[:]
    hq = h.astype(jnp.int8)
    for wq in (w0, w1, w2, w3):
        acc = jax.lax.dot_general(
            hq, wq[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        hq = acc.astype(jnp.int8)
    out_ref[:] = jnp.dot(
        hq.astype(jnp.bfloat16), dec_w[:], preferred_element_type=jnp.float32
    ) + dec_b[:]


@functools.partial(jax.jit, static_argnames=("kernel", "tile"))
def _run(x, flat_weights, kernel, tile: int):
    n = x.shape[0]

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, IN_F), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    in_specs += [w_spec(w.shape) for w in flat_weights]
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, OUT_F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, OUT_F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (IN_F * HIDDEN + 4 * HIDDEN * HIDDEN
                           + HIDDEN * OUT_F),
            bytes_accessed=n * (IN_F + OUT_F) * 4 + 4 * HIDDEN * HIDDEN
            + 2 * (IN_F * HIDDEN + HIDDEN * OUT_F),
            transcendentals=0,
        ),
    )(x, *flat_weights)


def throughput(forward, x) -> float:
    x = jax.device_put(x)

    def loop(k):
        @jax.jit
        def run():
            def body(_, acc):
                out = forward(x + acc * 1e-38)
                return jnp.sum(out) * 1e-6

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    return BATCH / adaptive_diff(loop, 4, 24, reps=3, target_s=0.5)


def main():
    model = BilinearUnit(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 32), jnp.float32)
    variables = model.init(rng, x[:2], train=False)
    prepared = prepare_weights_int8(
        variables["params"], variables["batch_stats"]
    )
    flat = _flatten(prepared)
    xb = x.astype(jnp.bfloat16)

    rows = []
    for tile in (256, 512, 1024):
        pps = throughput(
            lambda x, t=tile: _run(x.astype(jnp.bfloat16), flat, _kernel, t), x
        )
        rows.append({"variant": "dynamic", "tile": tile,
                     "poses_per_sec": round(pps, 1)})
        print(json.dumps(rows[-1]), flush=True)
    for name, kern in (("fixed", _kernel_fixed), ("mxu-bound", _kernel_mxu)):
        pps = throughput(
            lambda x, k=kern: _run(x.astype(jnp.bfloat16), flat, k, 512), x
        )
        rows.append({"variant": name, "tile": 512,
                     "poses_per_sec": round(pps, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # Sanity: the production entry point still matches the dynamic row.
    pps = throughput(
        lambda x: lifting_forward_int8(x=x, prepared=prepared), x
    )
    print(json.dumps({"variant": "production-entry", "tile": 512,
                      "poses_per_sec": round(pps, 1)}), flush=True)

    # The shipped calibrated mode (lifting_int8.calibrate_scales +
    # static_scales=...): real scale math, constants baked in, 1024-row
    # tiles for large batches. Should land between "fixed" and "mxu-bound".
    scales = calibrate_scales(prepared, x)
    pps = throughput(
        lambda x: lifting_forward_int8(
            x=x, prepared=prepared, static_scales=scales
        ), x,
    )
    print(json.dumps({"variant": "production-static", "tile": 1024,
                      "scales": scales,
                      "poses_per_sec": round(pps, 1)}), flush=True)


if __name__ == "__main__":
    main()

"""Int8-quantized lifting inference: the four 1024x1024 hidden matmuls (98%
of the network's FLOPs) run on the MXU in int8, doubling the systolic array's
peak rate on v5e-class chips (int8 ~2x bf16 MACs/cycle).

The bf16 kernel (ops/pallas/lifting.py) already sits at ~90% of bf16 peak —
the only remaining throughput lever for the headline lifting-service path is
a narrower MAC. This is an OPTIONAL serving mode (``LiftingServer(...,
quantize="int8")``): training and the default path stay bf16/f32.

Scheme (standard dynamic-activation post-training quantization):
- weights: BN folded into the Linear first (lifting.fold_bn — exactly
  equivalent), then symmetric per-output-channel int8
  (``wq[:, j] = round(W[:, j] / s_j)``, ``s_j = max|W[:, j]| / 127``).
  Folding BEFORE quantizing matters: BN rescales each output channel, and
  per-channel scales absorb that exactly.
- activations: symmetric per-batch-tile dynamic scale (``s_x = max|h| /
  127``), computed on the VPU per 512-row tile; h >= 0 after ReLU so this
  loses one sign bit, which the MPJPE-delta test shows is immaterial.
- accumulation: int8 x int8 -> int32 on the MXU, dequantized as
  ``y = acc * (s_x * s_w[None, :]) + b`` in f32.
- encode (32x1024) and decode (1024x48) stay bf16: together they are ~2% of
  FLOPs and their odd shapes would pad badly to int8 MXU tiles.

Both a Pallas whole-network kernel (weights VMEM-resident, zero HBM traffic
for intermediates — same structure as the bf16 kernel) and an XLA reference
path (``backend="xla"``) are provided; the XLA path is the correctness
oracle in tests and the fallback if Mosaic rejects int8 dots.

Reference model being served: /root/reference/model/bilinear.py:31-41
(BilinearUnit); the reference has no quantized path — this is TPU-native
added value, accuracy-gated by tests/test_lifting_int8.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bilinear_tpu.ops.pallas.lifting import (
    HIDDEN,
    IN_F,
    OUT_F,
    TILE,
    fold_bn,
)

_HIDDEN_NAMES = ["bilinear_0_0", "bilinear_0_1", "bilinear_1_0", "bilinear_1_1"]


def quantize_weight(w):
    """Symmetric per-output-channel int8. Returns (wq int8 (in, out),
    scale f32 (out,))."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def prepare_weights_int8(params, batch_stats):
    """Fold BN, quantize the four hidden layers, keep encode/decode bf16.
    Do this ONCE per checkpoint. Returns a dict pytree."""
    def folded(name):
        return fold_bn(
            params[name]["linear"]["kernel"],
            params[name]["linear"]["bias"],
            batch_stats[name]["bn"] | {
                "scale": params[name]["bn"]["scale"],
                "bias": params[name]["bn"]["bias"],
            },
        )

    enc_w, enc_b = folded("encode")
    hidden = []
    for name in _HIDDEN_NAMES:
        w, b = folded(name)
        wq, ws = quantize_weight(w)
        hidden.append((wq, ws, b.astype(jnp.float32)))
    return {
        "encode": (enc_w.astype(jnp.bfloat16), enc_b.astype(jnp.float32)),
        "hidden": hidden,
        "decode": (
            params["decode"]["kernel"].astype(jnp.bfloat16),
            params["decode"]["bias"].astype(jnp.float32),
        ),
    }


def _quant_dot(h, wq, ws, b, s_x=None):
    """relu((q(h) @ wq) * (s_x * s_w) + b) for one f32 activation block.
    Works identically inside the Pallas kernel and under XLA. ``s_x=None``
    computes the dynamic per-block scale; a float fixes it (static mode)."""
    if s_x is None:
        amax = jnp.max(jnp.abs(h))
        s_x = jnp.maximum(amax, 1e-12) / 127.0
    hq = jnp.clip(jnp.round(h / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * ws)[None, :] + b[None, :]
    return jnp.maximum(y, 0.0)


@functools.lru_cache(maxsize=16)
def _make_static_kernel(scales):
    """The whole-network int8 kernel, parameterized by the four activation
    scales: ``None`` entries compute the dynamic per-tile amax (the default
    mode); floats bake in as constants (calibrated static quantization).
    Removing the per-tile amax reduce is worth ~14% on-chip
    (benchmarks/int8_scale_probe.py: dynamic 33.2 M -> fixed 38.0 M
    poses/sec at tile 512, within 1.7% of the kernel's MXU-bound ceiling),
    and makes the numerics tile-size-independent."""
    sx0, sx1, sx2, sx3 = scales

    def kernel(x_ref, enc_w, enc_b,
               w0, s0, b0, w1, s1, b1, w2, s2, b2, w3, s3, b3,
               dec_w, dec_b, out_ref):
        h = jnp.dot(
            x_ref[:], enc_w[:], preferred_element_type=jnp.float32
        ) + enc_b[:]
        h = jnp.maximum(h, 0.0)  # f32 activations between quantized layers
        skip = h
        h = _quant_dot(h, w0[:], s0[:], b0[:], s_x=sx0)
        h = _quant_dot(h, w1[:], s1[:], b1[:], s_x=sx1)
        h = h + skip
        skip = h
        h = _quant_dot(h, w2[:], s2[:], b2[:], s_x=sx2)
        h = _quant_dot(h, w3[:], s3[:], b3[:], s_x=sx3)
        h = h + skip
        out_ref[:] = jnp.dot(
            h.astype(jnp.bfloat16), dec_w[:], preferred_element_type=jnp.float32
        ) + dec_b[:]

    return kernel


# The dynamic-scale kernel is the same code with no scale baked in (used
# directly by benchmarks/int8_scale_probe.py).
_kernel = _make_static_kernel((None,) * 4)


def _round_sig(x: float, digits: int = 3) -> float:
    """Round to ``digits`` significant figures — calibration scales are
    coarsened so that re-calibrating after a checkpoint hot-reload usually
    produces the SAME floats, letting the jitted static program hit the
    compile cache instead of recompiling per reload."""
    if x == 0.0:
        return 0.0
    from math import floor, log10

    return round(x, -int(floor(log10(abs(x)))) + digits - 1)


def calibrate_scales(prepared, x, margin: float = 1.0, digits: int = 3):
    """Static per-layer activation scales from a calibration batch.

    Runs the dynamic-int8 forward on ``x`` (f32, pre-normalized inputs —
    the serving path z-scores, so a standard-normal sample is
    representative) and records max|h| entering each of the four quantized
    layers. Returns a tuple of four PYTHON floats (``amax * margin / 127``,
    rounded to ``digits`` significant figures) — keep them OUT of jitted
    pytrees and pass via ``lifting_forward_int8(static_scales=...)`` so
    they compile as constants. Inputs beyond the calibrated range saturate
    at +-127 (graceful int8 clipping); raise ``margin`` for headroom."""
    enc_w, enc_b = prepared["encode"]
    (w0, s0, b0), (w1, s1, b1), (w2, s2, b2), (w3, s3, b3) = (
        prepared["hidden"]
    )

    @jax.jit
    def amaxes(x):
        h = jnp.dot(
            x.astype(jnp.bfloat16), enc_w, preferred_element_type=jnp.float32
        ) + enc_b
        h = jnp.maximum(h, 0.0)
        skip = h
        a0 = jnp.max(jnp.abs(h))
        h = _quant_dot(h, w0, s0, b0)
        a1 = jnp.max(jnp.abs(h))
        h = _quant_dot(h, w1, s1, b1)
        h = h + skip
        a2 = jnp.max(jnp.abs(h))
        h = _quant_dot(h, w2, s2, b2)
        a3 = jnp.max(jnp.abs(h))
        return jnp.stack([a0, a1, a2, a3])

    a = jax.device_get(amaxes(jnp.asarray(x, jnp.float32)))
    return tuple(
        _round_sig(max(float(v), 1e-12) * margin / 127.0, digits) for v in a
    )


def _flatten(prepared):
    enc_w, enc_b = prepared["encode"]
    dec_w, dec_b = prepared["decode"]
    flat = [enc_w, enc_b]
    for wq, ws, b in prepared["hidden"]:
        flat.extend([wq, ws, b])
    flat.extend([dec_w, dec_b])
    return flat


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile", "static_scales")
)
def _run_pallas(x, flat_weights, interpret: bool = False, tile: int = TILE,
                static_scales=None):
    n = x.shape[0]
    kernel = _make_static_kernel(
        (None,) * 4 if static_scales is None else static_scales
    )

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
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (IN_F * HIDDEN + 4 * HIDDEN * HIDDEN
                           + HIDDEN * OUT_F),
            bytes_accessed=n * (IN_F + OUT_F) * 4
            + 4 * HIDDEN * HIDDEN
            + 2 * (IN_F * HIDDEN + HIDDEN * OUT_F),
            transcendentals=0,
        ),
    )(x, *flat_weights)


def forward_chain(prepared, scales):
    """The whole-network int8 forward as a plain XLA function over one
    activation block: encode (bf16) -> 4 quantized hidden layers with
    residual skips -> decode (bf16). ``scales`` entries are per-layer
    activation scales (``None`` = dynamic per-block amax). Shared by the
    ``backend="xla"`` oracle (per-tile, bit-comparable to the kernel) and
    the symbolic-batch AOT export (static scales, no tiling)."""
    enc_w, enc_b = prepared["encode"]
    dec_w, dec_b = prepared["decode"]
    (w0, s0, b0), (w1, s1, b1), (w2, s2, b2), (w3, s3, b3) = (
        prepared["hidden"]
    )
    sx = scales

    def fwd(xt):
        h = jnp.dot(
            xt.astype(jnp.bfloat16), enc_w,
            preferred_element_type=jnp.float32,
        ) + enc_b
        h = jnp.maximum(h, 0.0)
        skip = h
        h = _quant_dot(h, w0, s0, b0, s_x=sx[0])
        h = _quant_dot(h, w1, s1, b1, s_x=sx[1])
        h = h + skip
        skip = h
        h = _quant_dot(h, w2, s2, b2, s_x=sx[2])
        h = _quant_dot(h, w3, s3, b3, s_x=sx[3])
        h = h + skip
        return jnp.dot(
            h.astype(jnp.bfloat16), dec_w, preferred_element_type=jnp.float32
        ) + dec_b

    return fwd


def int8_static_forward(prepared, static_scales):
    """Whole-batch straight-line forward with calibrated CONSTANT scales —
    no Pallas, no tiling, no data-dependent scale math, which makes it
    ``jax.export``-able with a symbolic batch dimension (io/aot.py's
    quantized artifact). Static scales also make the numerics independent
    of how rows are grouped, so this matches the tiled paths row-for-row."""
    if any(s is None for s in static_scales):
        raise ValueError("int8_static_forward needs all four scales fixed")
    return forward_chain(prepared, tuple(static_scales))


@functools.partial(jax.jit, static_argnames=("tile", "static_scales"))
def _run_xla(x, prepared, tile: int = TILE, static_scales=None):
    """Same math as the kernel, straight-line XLA — oracle + fallback. The
    per-TILE dynamic activation scale is reproduced exactly so both backends
    are bit-comparable; with ``static_scales`` the same constants are baked
    in instead (numerics then independent of ``tile``)."""
    tile_fn = forward_chain(
        prepared, (None,) * 4 if static_scales is None else static_scales
    )
    n = x.shape[0]
    xt = x.reshape(n // tile, tile, IN_F)
    return jax.lax.map(tile_fn, xt).reshape(n, OUT_F)


def lifting_forward_int8(
    params=None, batch_stats=None, x=None, *,
    prepared=None, backend: str = "pallas", interpret: bool = False,
    static_scales=None,
):
    """Drop-in eval-mode forward, int8 hidden layers. Same contract as
    ``lifting.lifting_forward``: pads the batch to a tile multiple, unpads
    the result. Pass ``prepared=prepare_weights_int8(...)`` to amortize.

    ``static_scales``: a tuple of four python floats from
    ``calibrate_scales`` — bakes the activation scales in as constants
    (calibrated static quantization), which removes the per-tile amax
    reduce (~14% faster on-chip) and makes the result independent of the
    tile size, so large batches also run the 1024-row tile (another ~5%)."""
    if prepared is None:
        prepared = prepare_weights_int8(params, batch_stats)
    n = x.shape[0]
    tile = 1024 if (static_scales is not None and n >= 1024) else TILE
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    x = x.astype(jnp.bfloat16)
    if backend == "pallas":
        out = _run_pallas(x, _flatten(prepared), interpret=interpret,
                          tile=tile, static_scales=static_scales)
    elif backend == "xla":
        out = _run_xla(x, prepared, tile=tile, static_scales=static_scales)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return out[:n]

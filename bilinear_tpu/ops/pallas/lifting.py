"""Pallas TPU kernel: the entire bilinear lifting network's inference forward
in ONE kernel invocation.

Why a hand kernel here: the lifting service is the framework's headline
throughput path (BASELINE.json: 'batched lifting inference ... at
speed-of-light on a single TPU chip'). The whole network is small enough that
every weight fits VMEM (~8.6 MB bf16), so one kernel can stream batch tiles
from HBM and run all 6 matmuls back-to-back on the MXU with zero HBM traffic
for intermediate activations — where the XLA program writes each layer's
activation (B,1024) out to HBM between fusions at large B.

Inference-only simplifications (exactly equivalent, not approximations):
- BatchNorm folds into the preceding Linear: y = BN(xW + b) == x(W*s) + (b*s
  + t) with s = gamma/rsqrt(var+eps), t = beta - mean*s  (fold_bn below);
- Dropout is identity in eval mode (the reference's eval() path).

Structure mirrors BilinearUnit (model/bilinear.py:31-41): encode -> 2
residual blocks of two Linear+BN+ReLU layers with additive skip -> decode.

The public entry ``lifting_forward`` takes the SAME {params, batch_stats}
tree the flax model uses, so it is a drop-in replacement for
``model.apply(..., train=False)``; ``interpret=True`` runs it on CPU for
tests.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIDDEN = 1024
IN_F = 32
OUT_F = 48
TILE = 512  # batch rows per grid step (bf16 sublane-aligned)


def fold_bn(kernel, bias, bn, eps: float = 1e-5):
    """Fold torch-semantics BN (core/norm.py) into the preceding Linear."""
    s = bn["scale"] / jnp.sqrt(bn["var"] + eps)
    t = bn["bias"] - bn["mean"] * s
    return kernel * s[None, :], bias * s + t


def _kernel(x_ref, w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, out_ref):
    """One batch tile through the whole network. Weights live in VMEM for the
    entire grid; matmuls accumulate f32 on the MXU."""

    def dense_relu(h, w, b):
        y = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        return jnp.maximum(y, 0.0).astype(h.dtype)

    h = dense_relu(x_ref[:], w0, b0)  # encode
    skip = h
    h = dense_relu(h, w1, b1)
    h = dense_relu(h, w2, b2)
    h = (h + skip).astype(h.dtype)
    skip = h
    h = dense_relu(h, w3, b3)
    h = dense_relu(h, w4, b4)
    h = (h + skip).astype(h.dtype)
    out_ref[:] = (
        jnp.dot(h, w5[:], preferred_element_type=jnp.float32) + b5[:]
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x, weights, interpret: bool = False):
    n = x.shape[0]
    grid = n // TILE

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((TILE, IN_F), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w, b in weights:
        in_specs.append(w_spec(w.shape))
        in_specs.append(w_spec(b.shape))

    flat = [x]
    for w, b in weights:
        flat.extend([w, b])

    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE, OUT_F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, OUT_F), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (IN_F * HIDDEN + 4 * HIDDEN * HIDDEN + HIDDEN * OUT_F),
            bytes_accessed=n * (IN_F + OUT_F) * 4
            + 2 * (IN_F * HIDDEN + 4 * HIDDEN * HIDDEN + HIDDEN * OUT_F),
            transcendentals=0,
        ),
    )(*flat)


def prepare_weights(params, batch_stats, dtype=jnp.bfloat16):
    """Fold BN and cast — do this ONCE per checkpoint, not per batch."""
    names = ["encode", "bilinear_0_0", "bilinear_0_1", "bilinear_1_0", "bilinear_1_1"]
    weights = []
    for name in names:
        k, b = fold_bn(
            params[name]["linear"]["kernel"],
            params[name]["linear"]["bias"],
            batch_stats[name]["bn"] | {
                "scale": params[name]["bn"]["scale"],
                "bias": params[name]["bn"]["bias"],
            },
        )
        weights.append((k.astype(dtype), b.astype(jnp.float32)))
    weights.append(
        (
            params["decode"]["kernel"].astype(dtype),
            params["decode"]["bias"].astype(jnp.float32),
        )
    )
    return weights


def lifting_forward(
    params, batch_stats, x, dtype=jnp.bfloat16, interpret: bool = False,
    prepared=None,
):
    """Drop-in eval-mode forward: pads the batch to a TILE multiple, runs the
    fused kernel, unpads. Pass ``prepared=prepare_weights(...)`` to amortize
    the BN fold across calls."""
    weights = prepared if prepared is not None else prepare_weights(
        params, batch_stats, dtype
    )
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    out = _run(x.astype(dtype), weights, interpret=interpret)
    return out[:n]

"""Dynamic int8 post-training quantization for convolutions.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 MAC rate, and XLA
lowers ``lax.conv_general_dilated`` on int8 operands to native quantized
convolutions. This module provides the call-time quantized conv used by the
hourglass eval/serving path (``MainModel(quantize="int8")`` /
``End2EndServer(quantize="int8")``):

- weights: symmetric per-output-channel int8
  (``kq[..., j] = round(k[..., j] / s_j)``, ``s_j = max|k[..., j]| / 127``),
  quantized at call time from the live f32 params — O(params) work,
  negligible next to the conv FLOPs, and it keeps the variable tree
  byte-identical to the unquantized model (same checkpoints load).
- activations: symmetric dynamic per-SAMPLE scale (axis (H, W, C)).
  Convolutions mix pixels only within a sample, so per-sample scales
  dequantize exactly; they are strictly tighter than one per-tensor scale.
- accumulation: int8 x int8 -> int32 on the MXU, dequantized as
  ``y = acc * (s_x * s_w) + bias`` in f32.

Zero-padding commutes with symmetric quantization (q(0) = 0), so 'SAME'-
style padding in quantized space is exact.

This mirrors the int8 lifting path (ops/pallas/lifting_int8.py) for the
conv model family. It is an eval/serving-only mode: training and the
default path stay bf16/f32. The reference has no quantized mode anywhere
(torch-CPU f32, /root/reference/model/hourglass_torch7.py:14-39).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_conv_kernel(kernel):
    """Symmetric per-output-channel int8 of an HWIO conv kernel.
    Returns (kq int8 (kh, kw, ci, co), scale f32 (co,))."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def quantize_activations(x):
    """Symmetric dynamic per-sample int8 of an NHWC activation tensor.
    Returns (xq int8, scale f32 (B, 1, 1, 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_conv(x, kernel, bias=None, *, stride: int = 1, out_dtype=None):
    """Quantized drop-in for the models' ``_conv`` application at eval time:
    NHWC x HWIO with pad = (k - 1) // 2 on both sides (torch Conv2d
    semantics). ``x`` and ``kernel`` are the ordinary float tensors; both
    are quantized here and the int32 accumulator is dequantized to
    ``out_dtype`` (default: x.dtype)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
    kq, ks = quantize_conv_kernel(kernel)
    xq, sx = quantize_activations(x)
    acc = lax.conv_general_dilated(
        xq, kq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * ks)  # (B,1,1,1)*(co,) -> (B,1,1,co)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)

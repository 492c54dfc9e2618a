"""Heatmap -> keypoint decoding and flip test-time augmentation.

Device-side replacements for the reference's decode paths:
- argmax decode (valid_hourglass.py:100-106, eval_hourglass.py:148-154)
- softargmax with the x10 temperature (model/end2end.py:9-18 — minus its
  hard-coded .cuda() and per-joint python loop)
- flip-TTA heatmap averaging (valid_hourglass.py:88-96)
"""
from __future__ import annotations

import jax.numpy as jnp

from bilinear_tpu.ops.joints import MPII_FLIP_SWAP


def argmax_decode(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """(..., J, H, W) -> (..., J, 2) heatmap-space (x, y):
    flat argmax, x = idx % W, y = idx // W."""
    h, w = heatmaps.shape[-2:]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], h * w)
    idx = jnp.argmax(flat, axis=-1)
    return jnp.stack([idx % w, idx // w], axis=-1).astype(jnp.float32)


def heatmap_to_image_space(
    pose_xy: jnp.ndarray,  # (..., J, 2) heatmap-space
    center_xy: jnp.ndarray,  # (..., 2)
    scale,  # (...,)
    size: int = 64,
) -> jnp.ndarray:
    """center + (p - size/2) / size * scale * 200 (valid_hourglass.py:104-106)."""
    scale = jnp.asarray(scale)
    return center_xy[..., None, :] + (pose_xy - size // 2) / size * (
        scale[..., None, None] * 200.0
    )


def softargmax(heatmaps: jnp.ndarray, temperature: float = 10.0) -> jnp.ndarray:
    """(..., H, W) -> (..., 2) soft (x, y): per-axis marginal sums scaled by
    ``temperature``, softmaxed, then expectation over the index range.
    Matches model/end2end.py:9-18 (dim=0 sum -> x, dim=1 sum -> y) but fully
    batched/differentiable — this is what makes the fused end2end program
    trainable."""
    h, w = heatmaps.shape[-2:]
    sum_over_y = jnp.sum(heatmaps, axis=-2)  # (..., W) -> x marginal
    sum_over_x = jnp.sum(heatmaps, axis=-1)  # (..., H) -> y marginal

    def expectation(marginal, n):
        x = temperature * marginal
        x = x - jnp.max(x, axis=-1, keepdims=True)
        # The clip is a numerical barrier, not a heuristic: under jit, XLA's
        # algebraic simplifier may hoist exp(-max) out of the downstream sum,
        # recreating the overflowing exp(t*marginal) that the max-subtraction
        # exists to avoid (inf * 0 -> NaN for |heatmap| >~ 1e7 garbage
        # inputs). Clamping to [-80, 0] bounds exp's input on both sides so
        # no reassociation can overflow; terms below exp(-80) contribute
        # nothing to the expectation anyway.
        p = jnp.exp(jnp.clip(x, -80.0, 0.0))
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.sum(p * jnp.arange(n, dtype=jnp.float32), axis=-1)

    return jnp.stack(
        [expectation(sum_over_y, w), expectation(sum_over_x, h)], axis=-1
    )


def flip_average(
    heatmaps: jnp.ndarray,  # (..., J, H, W) from the original image
    flipped_heatmaps: jnp.ndarray,  # (..., J, H, W) from the x-flipped image
    swap=MPII_FLIP_SWAP,
) -> jnp.ndarray:
    """Average the straight heatmaps with the L/R-channel-swapped, unflipped
    heatmaps of the mirrored input (valid_hourglass.py:88-96)."""
    unflipped = jnp.flip(
        jnp.take(flipped_heatmaps, jnp.asarray(swap), axis=-3), axis=-1
    )
    return (heatmaps + unflipped) / 2.0


def decode_to_normalized(
    heat_last: jnp.ndarray,  # (B, H, W, J) final-stack heatmaps, NHWC
    centers: jnp.ndarray,  # (B, 2)
    scales,  # (B,)
    mean_part: jnp.ndarray,  # (32,) H36M train-split part stats
    std_part: jnp.ndarray,  # (32,)
    temperature: float = 10.0,
):
    """The detector->lifting glue chain shared by the fused End2End program
    (models/end2end.py) and its pipelined variant (parallel/pp.py):
    softargmax (x10 temperature, model/end2end.py:14) -> image space ->
    MPII->H36M joint remap with the nose slot deleted -> z-score. Returns
    (pose_img (B, 16, 2), normalized (B, 32))."""
    from bilinear_tpu.ops.joints import H36M16_FROM_MPII

    hm = jnp.transpose(heat_last, (0, 3, 1, 2))  # (B, J, H, W)
    pose_hm = softargmax(hm, temperature)
    pose_img = heatmap_to_image_space(pose_hm, centers, scales)
    part16 = jnp.take(pose_img, jnp.asarray(H36M16_FROM_MPII), axis=-2)
    flat = part16.reshape(part16.shape[0], -1)  # (B, 32)
    return pose_img, (flat - mean_part) / std_part

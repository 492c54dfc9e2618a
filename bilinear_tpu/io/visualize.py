"""Heatmap visualization for TensorBoard — vectorized jnp port of the
reference's color-gradient LUT renderer (util/visualize.py:4-37).

colorize: max over joint channels -> piecewise-linear interpolation through a
color-gradient table -> RGB NCHW. overlap: alpha-blend over the input image.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# MSDN 'Heat Map Color Gradients' (util/visualize.py:4-16)
COLOR_SPECTRUM = np.asarray(
    [
        [0.0, 0.0, 0.5],  # Navy
        [0.0, 0.0, 1.0],  # Blue
        [0.0, 1.0, 0.0],  # Green
        [1.0, 1.0, 0.0],  # Yellow
        [1.0, 0.0, 0.0],  # Red
    ],
    np.float32,
)
INCANDESCENT = np.asarray(
    [
        [0.0, 0.0, 0.0],  # Black
        [0.5, 0.0, 0.0],  # Dark red
        [1.0, 1.0, 0.0],  # Yellow
        [1.0, 1.0, 1.0],  # White
    ],
    np.float32,
)


def colorize(heatmaps: jnp.ndarray, color_gradient=COLOR_SPECTRUM) -> jnp.ndarray:
    """(B, J, H, W) -> (B, 3, H, W) RGB via the gradient LUT."""
    lut = jnp.asarray(color_gradient)
    n = lut.shape[0]
    intensity = jnp.max(heatmaps, axis=1)  # (B, H, W)
    index = jnp.clip(intensity * (n - 1), 0.0, n - 1)
    lo = jnp.floor(index).astype(jnp.int32)
    hi = jnp.ceil(index).astype(jnp.int32)
    rate = (index - lo)[..., None]
    rgb = lut[lo] * (1 - rate) + lut[hi] * rate  # (B, H, W, 3)
    return jnp.transpose(rgb, (0, 3, 1, 2))


def overlap(heatmaps: jnp.ndarray, images: jnp.ndarray, ratio: float = 0.5):
    """Alpha-blend colorized heatmaps over images (both (B, 3, H, W))."""
    assert 0.0 <= ratio <= 1.0
    return heatmaps * ratio + images * (1 - ratio)


def upscale_nchw(images: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor upscale of (B, C, H, W) by an integer factor (the
    reference's 64->256 TB overlay resize, valid_hourglass.py:56-61)."""
    return jnp.repeat(jnp.repeat(images, factor, axis=-2), factor, axis=-1)


def heatmap_overlay(images_nhwc, heatmaps_sbhwj, gradient=COLOR_SPECTRUM):
    """Build the TB overlay image: last-stack heatmaps colorized, upscaled to
    the image resolution and blended (train_hourglass.py:84-89)."""
    hm = jnp.transpose(heatmaps_sbhwj[-1], (0, 3, 1, 2))  # (B, J, h, w)
    colored = colorize(hm, gradient)
    factor = images_nhwc.shape[1] // colored.shape[-1]
    colored = upscale_nchw(colored, factor)
    images = jnp.transpose(images_nhwc, (0, 3, 1, 2))
    return np.asarray(overlap(colored, images))

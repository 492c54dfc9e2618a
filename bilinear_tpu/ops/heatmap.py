"""Gaussian target-heatmap rendering as a vectorized, fusable device op.

Replaces the reference's per-joint numpy patch-paste (MPII/util.py:88-98 /
H36M/util.py:104-114, called per sample in DataLoader workers) with one
batched expression XLA fuses straight into the training step.

Exact parity contract with ``draw_heatmap(size, y0, x0, sigma)``:
- centers are INTEGER-truncated before stamping (y0, x0 = int(y0), int(x0));
- the stamped patch is ``gaussian(6*sigma + 1)`` evaluated on a (6s+1)^2
  window: g(dy,dx) = exp(-0.5 * (dy^2 + dx^2) / (0.25*(6*sigma+1))^2),
  zero outside |dy|,|dx| <= 3*sigma;
- joints whose float coords fall outside [0, size) are skipped entirely
  (the caller's bounds check, MPII/data.py:131-135) — expressed here as a
  validity mask so shapes stay static (SURVEY.md §7 'static shapes').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def render_heatmaps(
    coords_xy: jnp.ndarray,  # (..., J, 2) float, heatmap-space (x, y)
    valid: jnp.ndarray,  # (..., J) bool — render only these joints
    size: int = 64,
    sigma: int = 1,
) -> jnp.ndarray:
    """Returns (..., J, size, size) float32 heatmaps."""
    pad = 3 * sigma
    denom = 0.25 * (6 * sigma + 1)

    x0 = jnp.floor(coords_xy[..., 0]).astype(jnp.int32)  # int() trunc; coords >= 0
    y0 = jnp.floor(coords_xy[..., 1]).astype(jnp.int32)

    # Bounds check on the FLOAT coords, matching the caller's skip rule.
    in_bounds = (
        (coords_xy[..., 0] >= 0)
        & (coords_xy[..., 1] >= 0)
        & (coords_xy[..., 0] < size)
        & (coords_xy[..., 1] < size)
    )
    keep = valid & in_bounds

    rows = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)

    dy = rows - y0[..., None, None]  # (..., J, size, size)
    dx = cols - x0[..., None, None]
    window = (jnp.abs(dy) <= pad) & (jnp.abs(dx) <= pad)
    g = jnp.exp(
        -0.5 * (dy.astype(jnp.float32) ** 2 + dx.astype(jnp.float32) ** 2) / denom**2
    )
    return jnp.where(window & keep[..., None, None], g, 0.0).astype(jnp.float32)


def keypoints_to_heatmap_space(
    keypoints_xy: jnp.ndarray,  # (..., J, 2) image-space pixels
    center_xy: jnp.ndarray,  # (..., 2)
    scale,  # (...,) person bbox = 200*scale px
    rotate_deg=0.0,  # (...,) augmentation rotation
    size: int = 64,
):
    """Image space -> heatmap space (MPII/data.py:119-131):
    p = (kp - center) * size / (200*scale), rotated by the augmentation angle
    [x' = sin*y + cos*x ; y' = cos*y - sin*x], then + size//2."""
    scale = jnp.asarray(scale)
    rot = jnp.asarray(rotate_deg) * (jnp.pi / 180.0)
    p = (keypoints_xy - center_xy[..., None, :]) * (
        size / (200.0 * scale[..., None, None])
    )
    cos, sin = jnp.cos(rot), jnp.sin(rot)
    x = sin[..., None] * p[..., 1] + cos[..., None] * p[..., 0]
    y = cos[..., None] * p[..., 1] - sin[..., None] * p[..., 0]
    return jnp.stack([x, y], axis=-1) + size // 2

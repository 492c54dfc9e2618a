"""Crop / rotate / resize as ONE batched affine gather — the TPU-native
replacement for the reference's multi-stage PIL pipeline
(crop_image: MPII/util.py:14-63, H36M/util.py:29-79).

The reference materializes intermediate images (integer box crop -> zero-pad
-> PIL rotate -> center crop -> PIL resize, with a separate early-downscale
path for boxes >2x the output). All of those stages compose into a single
affine map from output pixels to source pixels; we evaluate that map once and
bilinearly gather with zero padding. Every data-dependent quantity (box
corners, rotation) enters only as *scalar affine coefficients*, so the
program keeps fully static shapes (SURVEY.md §7 hard parts #3).

Semantics preserved exactly:
- integer truncation of box corners ul/br (the crop shifts by up to 1 px with
  the float center — metric-relevant, so reproduced);
- rotation about the box center (the reference pads before rotating only so
  PIL doesn't clip corners — direct sampling needs no padding);
- PIL pixel-center conventions for resize ((d+0.5)*scale-0.5) and rotate
  (about (w/2, h/2), CCW) — validated pixel-close against PIL in tests.

The crop_ratio>=2 early-downscale branch is intentionally NOT reproduced: it
is a performance workaround that resamples twice (losing high-frequency
detail); the single-pass gather implements the same crop more faithfully.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def _dst_to_src_coords(
    center_xy: jnp.ndarray,  # (2,)
    scale,  # scalar; box side = 200*scale source px
    rotate_deg,  # scalar; CCW like PIL.Image.rotate
    res: int,
):
    """Build (ys, xs) source-coordinate grids of shape (res, res)."""
    half = 100.0 * scale
    ul = jnp.trunc(center_xy - half)  # int truncation as in the reference
    br = jnp.trunc(center_xy + half)
    box = br - ul  # (w, h), float scalars

    d = jnp.arange(res, dtype=jnp.float32)
    # PIL resize: dst center (d+0.5) -> box coord (d+0.5)*box/res, index
    # space offset -0.5.
    xb = (d[None, :] + 0.5) * (box[0] / res) - 0.5
    yb = (d[:, None] + 0.5) * (box[1] / res) - 0.5
    xb, yb = jnp.broadcast_arrays(xb, yb)

    cx = (box[0] - 1.0) / 2.0
    cy = (box[1] - 1.0) / 2.0
    theta = jnp.deg2rad(rotate_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # PIL rotate(angle) turns image content CCW; its dst->src map is the CW
    # rotation about the center.
    dxb, dyb = xb - cx, yb - cy
    xs = cx + cos * dxb - sin * dyb
    ys = cy + sin * dxb + cos * dyb

    return ys + ul[1], xs + ul[0]


def crop_image(
    image: jnp.ndarray,  # (H, W, C) float
    center_xy: jnp.ndarray,  # (2,)
    scale,
    rotate_deg=0.0,
    res: int = 256,
) -> jnp.ndarray:
    """(H, W, C) -> (res, res, C), zero outside the source."""
    ys, xs = _dst_to_src_coords(jnp.asarray(center_xy, jnp.float32), scale,
                                rotate_deg, res)
    sample = functools.partial(
        map_coordinates, coordinates=[ys, xs], order=1, mode="constant", cval=0.0
    )
    return jnp.stack(
        [sample(image[..., c]) for c in range(image.shape[-1])], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("res",))
def crop_batch(
    images: jnp.ndarray,  # (B, H, W, C)
    centers_xy: jnp.ndarray,  # (B, 2)
    scales: jnp.ndarray,  # (B,)
    rotates_deg: jnp.ndarray,  # (B,)
    res: int = 256,
) -> jnp.ndarray:
    """Batched crop: (B, H, W, C) -> (B, res, res, C)."""
    return jax.vmap(
        lambda im, c, s, r: crop_image(im, c, s, r, res)
    )(images, centers_xy, scales, rotates_deg)


def hflip(images: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip on the width axis of (..., H, W, C) images
    (transforms.functional.hflip at MPII/data.py:115)."""
    return jnp.flip(images, axis=-2)

"""Training augmentation under explicit JAX PRNG keys.

Reproduces the reference's augmentation semantics (SURVEY.md §8):
- ``rand(x) = clip(gauss(0,1)*x, -2x, +2x)`` (MPII/util.py:10-11)
- scale *= 2**rand(0.25); rotation = rand(30 deg) w.p. 0.4 else 0
  (MPII/data.py:83-87, H36M/data.py:127-129)
- horizontal flip w.p. 0.4 with L/R joint-id swap and rotate = -rotate
  (MPII/data.py:109-115)
- torchvision ColorJitter(0.3, 0.3, 0.3, 0.3): brightness/contrast/
  saturation factors ~ U[0.7, 1.3], hue shift ~ U[-0.3, 0.3], applied in a
  uniformly random order (MPII/data.py:35,137-138; H36M/data.py:62-64)

Everything is batched and jit-compatible: per-sample parameters come out of
one key, and the color ops run on whole image batches on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def rand(key: jax.Array, x: float, shape=()) -> jnp.ndarray:
    """Truncated gaussian: clip(N(0,1)*x, -2x, 2x)."""
    return jnp.clip(jax.random.normal(key, shape) * x, -2 * x, 2 * x)


class AugmentParams(NamedTuple):
    scale_factor: jnp.ndarray  # multiply the annotation scale by this
    rotate_deg: jnp.ndarray
    flip: jnp.ndarray  # bool


def sample_geometry(
    key: jax.Array,
    batch: int = 1,
    scale_jitter: float = 0.25,
    max_rotate: float = 30.0,
    rotate_prob: float = 0.4,
    flip_prob: float = 0.4,
) -> AugmentParams:
    """Per-sample geometric augmentation draws (train only)."""
    k_scale, k_rot, k_rot_gate, k_flip = jax.random.split(key, 4)
    scale_factor = 2.0 ** rand(k_scale, scale_jitter, (batch,))
    rotate = jnp.where(
        jax.random.uniform(k_rot_gate, (batch,)) <= rotate_prob,
        rand(k_rot, max_rotate, (batch,)),
        0.0,
    )
    flip = jax.random.uniform(k_flip, (batch,)) <= flip_prob
    return AugmentParams(scale_factor, rotate, flip)


# --------------------------------------------------------------------------
# Color jitter (torchvision-semantics), NHWC float images in [0, 1].
# --------------------------------------------------------------------------

# Plain tuple, converted under trace: a module-level jnp.asarray would
# initialize the JAX backend at import time, defeating the CLIs' platform
# override (config.apply_platform_override) for anything importing this
# module before parse_config runs.
_GRAY = (0.299, 0.587, 0.114)


def _blend(img, other, factor):
    return jnp.clip(factor * img + (1.0 - factor) * other, 0.0, 1.0)


def adjust_brightness(img, factor):
    return _blend(img, 0.0, factor)


def adjust_contrast(img, factor):
    mean = jnp.mean(
        jnp.tensordot(img, jnp.asarray(_GRAY), axes=[[-1], [0]]),
        axis=(-2, -1), keepdims=True,
    )[..., None]
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    gray = jnp.tensordot(img, jnp.asarray(_GRAY), axes=[[-1], [0]])[..., None]
    return _blend(img, gray, factor)


def rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(options):
        # Chained where-selects: jnp.choose lowers to a GATHER on TPU
        # (~25 ms on a 256^2 batch vs ~0.1 ms for selects).
        out = options[0]
        for idx in range(1, 6):
            out = jnp.where(i == idx, options[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, shift):
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + shift) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,  # (..., H, W, 3) float in [0, 1]
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.3,
) -> jnp.ndarray:
    """torchvision ColorJitter: random factors, random op order.

    Per-sample order (use under vmap for exact torchvision semantics on small
    batches). NOTE: under vmap, lax.switch executes every branch for every
    lane, so this costs ~4x the ops — the batched training path uses
    color_jitter_batch below instead.
    """
    k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(k_c, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(k_s, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)

    ops = [
        lambda im: adjust_brightness(im, fb),
        lambda im: adjust_contrast(im, fc),
        lambda im: adjust_saturation(im, fs),
        lambda im: adjust_hue(im, fh),
    ]
    order = jax.random.permutation(k_perm, 4)

    def apply_slot(img, slot):
        idx = order[slot]
        return jax.lax.switch(idx, ops, img), None

    img, _ = jax.lax.scan(apply_slot, img, jnp.arange(4))
    return img


_ORDERS = [
    (a, b, c, d)
    for a in range(4)
    for b in range(4)
    for c in range(4)
    for d in range(4)
    if len({a, b, c, d}) == 4
]  # the 24 permutations of (brightness, contrast, saturation, hue)


def color_jitter_batch(
    key: jax.Array,
    imgs: jnp.ndarray,  # (B, H, W, 3) float in [0, 1]
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.3,
) -> jnp.ndarray:
    """TPU-efficient ColorJitter: per-SAMPLE random factors, one random op
    ORDER per batch (a 24-way scalar switch, so each op runs exactly once on
    the whole batch — ~50x faster than the vmapped per-sample-order version,
    which multiplies every branch by every lane). The order statistics differ
    from torchvision only in that samples within one step share an order;
    factors — the metrically relevant part — remain fully per-sample."""
    B = imgs.shape[0]
    k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 5)

    def per_sample(k, lo, hi):
        return jax.random.uniform(k, (B, 1, 1, 1), minval=lo, maxval=hi)

    fb = per_sample(k_b, max(0.0, 1 - brightness), 1 + brightness)
    fc = per_sample(k_c, max(0.0, 1 - contrast), 1 + contrast)
    fs = per_sample(k_s, max(0.0, 1 - saturation), 1 + saturation)
    fh = jax.random.uniform(k_h, (B, 1, 1), minval=-hue, maxval=hue)

    ops = [
        lambda im: adjust_brightness(im, fb),
        lambda im: adjust_contrast(im, fc),
        lambda im: adjust_saturation(im, fs),
        lambda im: adjust_hue(im, fh),
    ]

    def seq(order):
        def run(im):
            for op_idx in order:
                im = ops[op_idx](im)
            return im

        return run

    order_idx = jax.random.randint(k_perm, (), 0, len(_ORDERS))
    return jax.lax.switch(order_idx, [seq(o) for o in _ORDERS], imgs)


def flip_keypoints_x(keypoints_xy, center_x, swap):
    """Mirror keypoints about the vertical line x=center_x and apply the L/R
    joint-id swap (MPII/data.py:109-113)."""
    mirrored = keypoints_xy.at[..., 0].set(2.0 * center_x - keypoints_xy[..., 0])
    return jnp.take(mirrored, jnp.asarray(swap), axis=-2)

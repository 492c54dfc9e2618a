"""Augmentation parity: rand() distribution contract, color-op formulas
(numpy transcriptions of torchvision.transforms.functional — torchvision is
not installed in this image), flip keypoint remap."""
import colorsys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.ops.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    color_jitter,
    flip_keypoints_x,
    hsv_to_rgb,
    rand,
    rgb_to_hsv,
    sample_geometry,
)
from bilinear_tpu.ops.joints import MPII_FLIP_SWAP

GRAY = np.asarray([0.299, 0.587, 0.114])


def test_rand_truncation_bounds():
    vals = np.asarray(rand(jax.random.PRNGKey(0), 0.25, (20000,)))
    assert vals.min() >= -0.5 - 1e-6 and vals.max() <= 0.5 + 1e-6
    assert abs(vals.mean()) < 0.01
    # clipped mass actually present at the +-2x bounds over 20k draws
    assert (np.abs(np.abs(vals) - 0.5) < 1e-6).sum() > 10


def test_sample_geometry_probabilities():
    p = sample_geometry(jax.random.PRNGKey(1), batch=20000)
    rot_rate = float((np.asarray(p.rotate_deg) != 0).mean())
    flip_rate = float(np.asarray(p.flip).mean())
    assert 0.37 < rot_rate < 0.43  # w.p. 0.4 (MPII/data.py:87)
    assert 0.37 < flip_rate < 0.43  # w.p. 0.4 (MPII/data.py:109)
    s = np.asarray(p.scale_factor)
    assert (s >= 2**-0.5 - 1e-6).all() and (s <= 2**0.5 + 1e-6).all()


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return rng.rand(2, 16, 16, 3).astype(np.float32)


def test_brightness_formula(img):
    """torchvision adjust_brightness: clamp(f * img)."""
    ours = np.asarray(adjust_brightness(jnp.asarray(img), 1.27))
    np.testing.assert_allclose(ours, np.clip(1.27 * img, 0, 1), atol=1e-6)


def test_contrast_formula(img):
    """torchvision adjust_contrast: blend with the scalar mean of the
    grayscale image."""
    f = 0.81
    mean = (img @ GRAY).mean(axis=(1, 2), keepdims=True)[..., None]
    expected = np.clip(f * img + (1 - f) * mean, 0, 1)
    ours = np.asarray(adjust_contrast(jnp.asarray(img), f))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_saturation_formula(img):
    """torchvision adjust_saturation: per-pixel blend with grayscale."""
    f = 1.19
    gray = (img @ GRAY)[..., None]
    expected = np.clip(f * img + (1 - f) * gray, 0, 1)
    ours = np.asarray(adjust_saturation(jnp.asarray(img), f))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_hue_matches_colorsys(img):
    """Hue shift vs python's colorsys as an independent HSV oracle."""
    shift = 0.21
    ours = np.asarray(adjust_hue(jnp.asarray(img), shift))
    expected = np.empty_like(img)
    for n in range(img.shape[0]):
        for i in range(img.shape[1]):
            for j in range(img.shape[2]):
                h, s, v = colorsys.rgb_to_hsv(*img[n, i, j])
                expected[n, i, j] = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_hsv_roundtrip(img):
    rt = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(img))))
    np.testing.assert_allclose(rt, img, atol=1e-5)


def test_color_jitter_runs_and_stays_in_range(img):
    out = np.asarray(color_jitter(jax.random.PRNGKey(3), jnp.asarray(img)))
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)


def test_flip_keypoints():
    kp = jnp.asarray(np.random.RandomState(0).rand(16, 2).astype(np.float32) * 100)
    out = np.asarray(flip_keypoints_x(kp, 50.0, MPII_FLIP_SWAP))
    expected = np.asarray(kp).copy()
    expected[:, 0] = 100.0 - expected[:, 0]
    expected = expected[MPII_FLIP_SWAP]
    np.testing.assert_allclose(out, expected, rtol=1e-6)

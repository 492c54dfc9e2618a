"""Affine crop sampler: pixel-closeness vs the reference's PIL pipeline
(crop_image at MPII/util.py:14-63), including rotation."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bilinear_tpu.data.h36m import _install_vectormath_shim
from bilinear_tpu.ops.affine import crop_batch, crop_image, hflip

_install_vectormath_shim()
sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ref_crop(tmp_path_factory):
    from oracle_loader import load_reference_module
    mpii_util = load_reference_module("H36M/util.py", "ref_h36m_util")
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")

    def run(img_u8, center, scale, rotate):
        path = str(d / "img.png")
        Image.fromarray(img_u8).save(path)
        from vectormath import Vector2

        out = mpii_util.crop_image(path, Vector2(center), scale, rotate)
        return np.asarray(out, np.float32) / 255.0

    return run


def _smooth_image(rng, h=480, w=640):
    """Low-frequency image so interpolation-convention differences stay small."""
    small = rng.rand(h // 16, w // 16, 3)
    from PIL import Image

    img = Image.fromarray((small * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR
    )
    return np.asarray(img, np.uint8)


@pytest.mark.parametrize("rotate", [0.0, 17.0, -25.0])
def test_crop_close_to_pil(ref_crop, rotate):
    rng = np.random.RandomState(int(abs(rotate)) + 1)
    img = _smooth_image(rng)
    center = np.asarray([320.0, 250.0], np.float32)
    scale = 1.1  # box 220 px < 2*256, the exact-path regime

    ref = ref_crop(img, center, scale, rotate)
    ours = np.asarray(
        crop_image(jnp.asarray(img, jnp.float32) / 255.0, center, scale, rotate)
    )
    assert ours.shape == ref.shape == (256, 256, 3)
    # Compare away from the border (PIL's rotate handles edges differently).
    diff = np.abs(ours - ref)[8:-8, 8:-8]
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.06


def test_crop_zero_padding_outside(ref_crop):
    rng = np.random.RandomState(7)
    img = _smooth_image(rng)
    # Box hangs off the top-left corner -> zero padding there.
    center = np.asarray([40.0, 30.0], np.float32)
    ref = ref_crop(img, center, 1.0, 0.0)
    ours = np.asarray(
        crop_image(jnp.asarray(img, jnp.float32) / 255.0, center, 1.0, 0.0)
    )
    diff = np.abs(ours - ref)
    assert diff.mean() < 0.01
    # Top-left corner is outside the source -> black in both.
    assert ours[:40, :40].max() < 1e-6
    assert ref[:40, :40].max() < 1e-6


def test_fast_crop_matches_gather_oracle():
    """MXU-native crop (separable matmul + three-shear rotation) vs the
    reference-exact gather path: identical at rotation 0, close otherwise."""
    from bilinear_tpu.ops.affine import crop_batch_gather

    rng = np.random.RandomState(11)
    img = _smooth_image(rng)  # smooth so interpolant differences stay small
    imgs = jnp.asarray(img, jnp.float32)[None].repeat(2, 0) / 255.0
    centers = jnp.asarray([[320.0, 250.0], [300.0, 200.0]], jnp.float32)
    scales = jnp.asarray([1.1, 0.9])

    a0 = np.asarray(crop_batch(imgs, centers, scales, jnp.zeros(2), res=256))
    b0 = np.asarray(crop_batch_gather(imgs, centers, scales, jnp.zeros(2), res=256))
    np.testing.assert_allclose(a0, b0, atol=1e-5)

    for rot in (17.0, -25.0, 55.0):
        a = np.asarray(crop_batch(imgs, centers, scales, jnp.full((2,), rot), res=256))
        b = np.asarray(
            crop_batch_gather(imgs, centers, scales, jnp.full((2,), rot), res=256)
        )
        d = np.abs(a - b)[:, 8:-8, 8:-8]
        assert d.mean() < 0.002, (rot, d.mean())
        assert np.quantile(d, 0.99) < 0.02, (rot, np.quantile(d, 0.99))


def test_crop_batch_jit():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(3, 128, 160, 3).astype(np.float32))
    centers = jnp.asarray([[80.0, 64.0]] * 3, jnp.float32)
    out = crop_batch(
        imgs, centers, jnp.asarray([0.5, 0.6, 0.7]), jnp.asarray([0.0, 10.0, -5.0]),
        res=64,
    )
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_hflip():
    x = jnp.asarray(np.arange(2 * 3 * 4 * 3).reshape(2, 3, 4, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(hflip(x)), np.asarray(x)[:, :, ::-1, :]
    )

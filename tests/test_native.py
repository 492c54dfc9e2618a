"""Native fastpack library: exactness vs PIL/numpy, and the pipeline
integration path."""
import numpy as np
import pytest
from PIL import Image

from bilinear_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if native.load() is None:
        pytest.skip("no native toolchain available")
    return True


def test_resize_matches_pil_bilinear(lib_available):
    rng = np.random.RandomState(0)
    src = (rng.rand(123, 200, 3) * 255).astype(np.uint8)
    for dh, dw in [(61, 100), (50, 77), (246, 400), (123, 200)]:
        ours = native.resize_linear_u8(src, dh, dw)
        ref = np.asarray(Image.fromarray(src).resize((dw, dh), Image.BILINEAR))
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (dh, dw, diff.max())  # rounding LSB only


def test_pack_canvas_matches_numpy(lib_available):
    rng = np.random.RandomState(1)
    src = (rng.rand(90, 120, 3) * 255).astype(np.uint8)
    for ul_x, ul_y in [(-20, 30), (0, 0), (100, 80), (-300, -300), (119, 89)]:
        ours = native.pack_canvas_f32(src, 64, ul_x, ul_y)
        ref = np.zeros((64, 64, 3), np.float32)
        sy0, sx0 = max(0, ul_y), max(0, ul_x)
        sy1, sx1 = min(90, ul_y + 64), min(120, ul_x + 64)
        if sy1 > sy0 and sx1 > sx0:
            ref[sy0 - ul_y : sy1 - ul_y, sx0 - ul_x : sx1 - ul_x] = (
                src[sy0:sy1, sx0:sx1] / 255.0
            )
        np.testing.assert_allclose(ours, ref, atol=1e-6), (ul_x, ul_y)


def test_pipeline_uses_native_path(lib_available, tmp_path):
    """record_to_canvas via the native packer equals the numpy fallback."""
    from bilinear_tpu.data import pipeline as pl
    from bilinear_tpu.data.mpii import MPIIRecord

    rng = np.random.RandomState(2)
    img = Image.fromarray((rng.rand(100, 140, 3) * 255).astype(np.uint8))
    rec = MPIIRecord(
        image_name="x.jpg",
        center=np.asarray([70.0, 50.0], np.float32),
        scale=0.3,  # 2*100*0.3*MARGIN = 123 < 128 canvas -> no prescale
        head=1.0,
        keypoints=np.full((16, 2), 60.0, np.float32),
        valid=np.ones(16, bool),
        img_idx=0,
        r_idx=0,
    )
    region, c, s, kp, head = pl.record_to_canvas(img, rec, canvas=128)
    assert region.shape == (128, 128, 3)
    assert head == rec.head  # no prescale -> head unchanged
    # Center maps into the canvas and pixel content matches the source crop.
    ul = np.floor(rec.center - 100 * rec.scale * pl.REGION_MARGIN).astype(int)
    np.testing.assert_allclose(c, rec.center - ul, atol=1e-5)
    sy, sx = 50 - ul[1], 70 - ul[0]
    np.testing.assert_allclose(
        region[sy, sx], np.asarray(img, np.float32)[50, 70] / 255.0, atol=1e-6
    )


def test_pack_canvas_u8_matches_f32(lib_available):
    """u8 wire format: region copy equals the f32 pack after /255."""
    rng = np.random.RandomState(3)
    src = (rng.rand(90, 120, 3) * 255).astype(np.uint8)
    for ul_x, ul_y in [(-20, 30), (0, 0), (100, 80), (-300, -300), (119, 89)]:
        u8 = native.pack_canvas_u8(src, 64, ul_x, ul_y)
        f32 = native.pack_canvas_f32(src, 64, ul_x, ul_y)
        assert u8.dtype == np.uint8
        np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32, atol=1e-6)

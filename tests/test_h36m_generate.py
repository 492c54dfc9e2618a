"""GT bin generation: projected bins load through the standard pipeline and
round-trip geometrically (unproject(project(S)) == S)."""
import numpy as np

import jax.numpy as jnp

from bilinear_tpu.data.camera import load_camera, unproject
from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.h36m_generate import build_gt_bin, project_poses, write_gt_bins

CALIB = "/root/reference/calibration"


def _skeletons(n, seed=0):
    rng = np.random.RandomState(seed)
    s = rng.randn(n, 17, 3).astype(np.float32) * 200
    s[:, :, 2] += 5000
    s[:, 0] = s.mean(axis=1)
    return s


def _names(n, task):
    return [f"S1_Walking.54138969_{task}{i:05d}.jpg" for i in range(n)]


def test_generated_bins_load_and_normalize(tmp_path):
    cam = load_camera(CALIB, "54138969")
    splits = {
        Task.Train: {"S": _skeletons(64), "images": _names(64, "t"), "camera": cam},
        Task.Valid: {"S": _skeletons(16, 1), "images": _names(16, "v"), "camera": cam},
    }
    paths = write_gt_bins(str(tmp_path), splits)
    assert len(paths) == 2

    loaded = load_h36m(str(tmp_path), Protocol.GT)
    tr = loaded[Task.Train]
    assert tr.part.shape == (64, 32)
    assert tr.s.shape == (64, 48)
    np.testing.assert_allclose(tr.part.mean(axis=0), 0, atol=1e-5)


def test_projection_unprojection_consistency():
    cam = load_camera(CALIB, "55011271")
    s = _skeletons(10)
    part = project_poses(s, cam)
    back = np.asarray(
        unproject(jnp.asarray(part), jnp.asarray(s[..., 2]), cam)
    )
    np.testing.assert_allclose(back, s, rtol=1e-4, atol=0.05)


def test_center_scale_cover_keypoints():
    cam = load_camera(CALIB, "58860488")
    s = _skeletons(32, seed=3)
    data = build_gt_bin(s, _names(32, "x"), cam)
    for i in range(32):
        part = data["part"][i]
        center = data["center"][i]
        half = 100.0 * data["scale"][i]
        assert (np.abs(part - center) <= half + 1e-3).all()

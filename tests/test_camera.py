"""Camera model: loads the real calibration files shipped with the reference
and checks projection math + unprojection round-trip."""
import numpy as np
import pytest

import jax.numpy as jnp

from bilinear_tpu.data.camera import (
    H36M_CAMERA_IDS,
    load_all_cameras,
    load_camera,
    project,
    project_np,
    unproject,
)

CALIB = "/root/reference/calibration"


def test_load_all_cameras():
    cams = load_all_cameras(CALIB)
    assert set(cams) == set(H36M_CAMERA_IDS)
    for cam in cams.values():
        assert cam.f.shape == (2,) and cam.c.shape == (2,)
        assert cam.k.shape == (3,) and cam.p.shape == (2,)
        assert (cam.f > 1000).all()  # H36M focal lengths ~1145 px


def test_project_matches_numpy_transcription():
    cam = load_camera(CALIB, "54138969")
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3).astype(np.float32) * 300
    pts[:, 2] = np.abs(pts[:, 2]) + 4000

    ours = np.asarray(project(jnp.asarray(pts), cam))

    # Direct transcription of the standard H36M distortion model.
    xy = pts[:, :2] / pts[:, 2:3]
    r2 = (xy**2).sum(1)
    radial = 1 + cam.k[0] * r2 + cam.k[1] * r2**2 + cam.k[2] * r2**3
    tan = cam.p[0] * xy[:, 1] + cam.p[1] * xy[:, 0]
    xxx = xy * (radial + tan)[:, None] + np.outer(r2, [cam.p[1], cam.p[0]])
    expected = xxx * cam.f + cam.c
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-3)

    # The host-side producer path (data/h36m_generate.py) must stay in
    # lockstep with the device path — it exists so bin generation never
    # dispatches eager device ops on a remote-tunnel platform.
    np.testing.assert_allclose(project_np(pts, cam), expected, rtol=1e-4,
                               atol=1e-3)


def test_project_center_ray():
    cam = load_camera(CALIB, "55011271")
    px = np.asarray(project(jnp.asarray([[0.0, 0.0, 5000.0]]), cam))
    np.testing.assert_allclose(px[0], cam.c, atol=1e-3)


@pytest.mark.parametrize("cam_id", H36M_CAMERA_IDS)
def test_unproject_roundtrip(cam_id):
    cam = load_camera(CALIB, cam_id)
    rng = np.random.RandomState(1)
    pts = rng.randn(100, 3).astype(np.float32) * 400
    pts[:, 2] = np.abs(pts[:, 2]) + 3000

    px = project(jnp.asarray(pts), cam)
    back = np.asarray(unproject(px, jnp.asarray(pts[:, 2]), cam))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=0.05)  # < 0.05 mm

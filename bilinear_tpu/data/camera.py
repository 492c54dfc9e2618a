"""Human3.6M camera calibration: loading, projection, and unprojection.

The reference ships per-camera intrinsics as 16 plain-text files
(calibration/{camera}_{c,f,k,p}.txt — principal point, focal lengths, 3
radial and 2 tangential distortion coefficients) but never loads them: they
document the external step that produced the annotation bins by projecting
3D camera-space GT into pixels (SURVEY.md §2.2 'Camera calibration data').
The rebuild implements that step, so GT bins can be regenerated and
detections can be unprojected.

Model (the standard H36M radial+tangential one):
    x = X/Z, y = Y/Z
    r2 = x^2 + y^2
    radial = 1 + k1 r2 + k2 r2^2 + k3 r2^3
    tan    = p1*y + p2*x
    x' = x*(radial + tan) + p2*r2 ;  y' = y*(radial + tan) + p1*r2
    u = f_x x' + c_x ;  v = f_y y' + c_y

Unprojection inverts the distortion with a fixed-point iteration (jittable
lax.fori_loop; converges in a handful of steps for H36M's mild distortion).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

H36M_CAMERA_IDS = ["54138969", "55011271", "58860488", "60457274"]


@dataclass(frozen=True)
class Camera:
    f: np.ndarray  # (2,) focal lengths (px)
    c: np.ndarray  # (2,) principal point (px)
    k: np.ndarray  # (3,) radial distortion
    p: np.ndarray  # (2,) tangential distortion
    name: str = ""


def load_camera(calibration_dir: str, camera_id: str) -> Camera:
    def read(suffix):
        return np.loadtxt(
            os.path.join(calibration_dir, f"{camera_id}_{suffix}.txt")
        ).reshape(-1)

    return Camera(
        f=read("f").astype(np.float32),
        c=read("c").astype(np.float32),
        k=read("k").astype(np.float32),
        p=read("p").astype(np.float32),
        name=camera_id,
    )


def load_all_cameras(calibration_dir: str) -> Dict[str, Camera]:
    return {cid: load_camera(calibration_dir, cid) for cid in H36M_CAMERA_IDS}


def _distort(xy: jnp.ndarray, k: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    r2 = jnp.sum(jnp.square(xy), axis=-1, keepdims=True)
    radial = 1.0 + k[0] * r2 + k[1] * r2**2 + k[2] * r2**3
    tan = p[0] * xy[..., 1:2] + p[1] * xy[..., 0:1]
    extra = jnp.concatenate([p[1] * r2, p[0] * r2], axis=-1)
    return xy * (radial + tan) + extra


def project(points_cam: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """(..., 3) camera-space mm -> (..., 2) pixels, with distortion."""
    f = jnp.asarray(camera.f)
    c = jnp.asarray(camera.c)
    xy = points_cam[..., :2] / points_cam[..., 2:3]
    return _distort(xy, jnp.asarray(camera.k), jnp.asarray(camera.p)) * f + c


def project_np(points_cam: np.ndarray, camera: Camera) -> np.ndarray:
    """Numpy mirror of :func:`project` for host-side producers.

    Dataset/bin generation runs on the host; on a remote-device platform
    (the tunneled 'axon' PJRT plugin) every eager jnp op is a remote
    dispatch, so the jnp path can stall generation behind device compiles.
    Keep this in lockstep with `_distort`/`project` above
    (tests/test_camera.py asserts equality).
    """
    k = np.asarray(camera.k, np.float32)
    p = np.asarray(camera.p, np.float32)
    pts = np.asarray(points_cam, np.float32)
    xy = pts[..., :2] / pts[..., 2:3]
    r2 = np.sum(np.square(xy), axis=-1, keepdims=True)
    radial = 1.0 + k[0] * r2 + k[1] * r2**2 + k[2] * r2**3
    tan = p[0] * xy[..., 1:2] + p[1] * xy[..., 0:1]
    extra = np.concatenate([p[1] * r2, p[0] * r2], axis=-1)
    distorted = xy * (radial + tan) + extra
    return distorted * np.asarray(camera.f, np.float32) + np.asarray(
        camera.c, np.float32
    )


def unproject(
    pixels: jnp.ndarray, depth: jnp.ndarray, camera: Camera, iters: int = 10
) -> jnp.ndarray:
    """(..., 2) pixels + (...,) depth mm -> (..., 3) camera-space mm.

    Undistorts by fixed-point iteration: xy <- target / correction(xy)."""
    f = jnp.asarray(camera.f)
    c = jnp.asarray(camera.c)
    k = jnp.asarray(camera.k)
    p = jnp.asarray(camera.p)
    target = (pixels - c) / f  # distorted normalized coords

    def body(_, xy):
        r2 = jnp.sum(jnp.square(xy), axis=-1, keepdims=True)
        radial = 1.0 + k[0] * r2 + k[1] * r2**2 + k[2] * r2**3
        tan = p[0] * xy[..., 1:2] + p[1] * xy[..., 0:1]
        extra = jnp.concatenate([p[1] * r2, p[0] * r2], axis=-1)
        return (target - extra) / (radial + tan)

    xy = jax.lax.fori_loop(0, iters, body, target)
    return jnp.concatenate(
        [xy * depth[..., None], depth[..., None]], axis=-1
    )

"""GT annotation-bin generation from 3D ground truth + camera calibration.

The reference assumes externally-built ``{train,valid}_GT.bin`` pickles and
ships only the per-camera intrinsics that produced them
(calibration/*.txt, never loaded by any reference code — SURVEY.md §2.2).
This module implements that missing producer: project camera-space 3D joints
through the full distortion model (data/camera.py) to obtain the 2D 'part'
annotations, derive person center/scale from the projected bounding box, and
emit schema-exact bins (keys per H36M/annotation.py:1-9).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Sequence

import numpy as np

from bilinear_tpu.data.camera import Camera, project_np
from bilinear_tpu.data.h36m import Annotation


def project_poses(s_cam: np.ndarray, camera: Camera) -> np.ndarray:
    """(N, 17, 3) camera-space mm -> (N, 17, 2) pixel keypoints.

    Pure numpy (camera.project_np): bin generation is host-side work and
    must not dispatch eager device ops — on the tunneled-TPU platform that
    serialized this producer behind minutes of remote compiles.
    """
    return project_np(np.asarray(s_cam, np.float32), camera)


def bbox_center_scale(part: np.ndarray, margin: float = 1.15):
    """Person center/scale from the projected keypoints: center = bbox
    center; scale chosen so the 200*scale crop box covers the bbox with a
    margin (the H36M convention of person box = 200*scale px)."""
    lo = part.min(axis=-2)  # (N, 2)
    hi = part.max(axis=-2)
    center = (lo + hi) / 2.0
    side = (hi - lo).max(axis=-1) * margin  # (N,)
    scale = side / 200.0
    return center.astype(np.float32), scale.astype(np.float32)


def build_gt_bin(
    s_cam: np.ndarray,  # (N, 17, 3) camera-space mm
    image_names: Sequence[str],
    camera: Camera,
) -> Dict[str, list]:
    """Assemble one schema-exact annotation dict."""
    n = s_cam.shape[0]
    assert len(image_names) == n
    part = project_poses(s_cam, camera)
    center, scale = bbox_center_scale(part)
    return {
        Annotation.Image: list(image_names),
        Annotation.S: [s_cam[i].astype(np.float32) for i in range(n)],
        Annotation.Part: [part[i].astype(np.float32) for i in range(n)],
        Annotation.Center: [center[i] for i in range(n)],
        Annotation.Scale: [float(s) for s in scale],
    }


def write_gt_bins(
    data_dir: str,
    splits: Dict[str, Dict[str, object]],
) -> List[str]:
    """splits: {task: {'S': (N,17,3), 'images': [...], 'camera': Camera}}.
    Writes ``{task}_GT.bin`` files; returns their paths."""
    os.makedirs(data_dir, exist_ok=True)
    paths = []
    for task, spec in splits.items():
        data = build_gt_bin(
            np.asarray(spec["S"], np.float32), spec["images"], spec["camera"]
        )
        path = os.path.join(data_dir, f"{task}_GT.bin")
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
        paths.append(path)
    return paths

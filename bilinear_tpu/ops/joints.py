"""Joint-order conventions and remaps between the MPII 16-joint and H36M
17-joint skeletons (SURVEY.md §2.2 'Joint-set remaps').

All maps are hard constants of the datasets; the reference scatters them
across scripts — they live here once, as jnp-ready index arrays.
"""
from __future__ import annotations

import numpy as np


class Keypoint:
    """Canonical MPII 16-joint order (MPII/keypoint.py:1-37)."""

    R_ankle = "R ankle"
    R_knee = "R knee"
    R_hip = "R hip"
    L_hip = "L hip"
    L_knee = "L knee"
    L_ankle = "L ankle"
    Pelvis = "Pelvis"
    Spine = "Spine"
    Thorax = "Thorax"
    Head = "Head"
    R_wrist = "R wrist"
    R_elbow = "R elbow"
    R_shoulder = "R shoulder"
    L_shoulder = "L shoulder"
    L_elbow = "L elbow"
    L_wrist = "L wrist"


MPII_KEYPOINTS = [
    Keypoint.R_ankle, Keypoint.R_knee, Keypoint.R_hip, Keypoint.L_hip,
    Keypoint.L_knee, Keypoint.L_ankle, Keypoint.Pelvis, Keypoint.Spine,
    Keypoint.Thorax, Keypoint.Head, Keypoint.R_wrist, Keypoint.R_elbow,
    Keypoint.R_shoulder, Keypoint.L_shoulder, Keypoint.L_elbow,
    Keypoint.L_wrist,
]

# Horizontal-flip left/right swap in MPII order (MPII/data.py:113,
# valid_hourglass.py:92).
MPII_FLIP_SWAP = np.asarray(
    [5, 4, 3, 2, 1, 0, 6, 7, 8, 9, 15, 14, 13, 12, 11, 10], np.int32
)

# 16 MPII-ordered channels -> 17 H36M-ordered joints ('SH preprocess.ipynb'
# cell 7; thorax is duplicated into H36M slots 9 and 10, one of which the
# lifting pipeline later deletes as 'nose').
FROM_MPII_TO_H36M = np.asarray(
    [6, 3, 4, 5, 2, 1, 0, 7, 8, 9, 9, 13, 14, 15, 12, 11, 10], np.int32
)

# 17 H36M-ordered heatmap channels -> 16 MPII-ordered channels
# (train_hourglass_FT.py:65).
FROM_H36M_TO_MPII = np.asarray(
    [6, 5, 4, 1, 2, 3, 0, 7, 8, 9, 15, 14, 13, 10, 11, 12], np.int32
)

# 16 MPII-ordered detections -> the 16-joint H36M lifting input: the 17-way
# remap with the 'nose' slot (H36M index 9, a duplicated thorax) deleted —
# exactly what H36M/data.py:41-43 does to the rewritten SH bins.
H36M16_FROM_MPII = np.delete(FROM_MPII_TO_H36M, 9)

# PCKh reporting drops pelvis & spine via this reorder:
# joints [0:6] + [10:16] + [8:10] (valid_hourglass.py:119-128,136).
PCKH_REORDER = np.asarray(
    list(range(0, 6)) + list(range(10, 16)) + [8, 9], np.int32
)

PCKH_KEYPOINTS = (
    MPII_KEYPOINTS[0:6] + MPII_KEYPOINTS[10:16] + MPII_KEYPOINTS[8:10]
)

"""Synthetic, schema-exact H36M/MPII fixtures for tests and benchmarks.

The reference assumes externally-built ``{train,valid}_{GT,SH,SH+FT}.bin``
pickles (SURVEY.md §8 documents the exact schema). Real Human3.6M data cannot
ship with either repo, so tests and benches run on synthetic bins with the
same keys, dtypes, and joint conventions:

- 'image': ``{subject}_{action}.{camera}_{frame}.jpg`` names
- 'S':      (N, 17, 3) float camera-space mm
- 'part':   (N, 17, 2) float pixel keypoints
- 'center': list of (2,) arrays (stands in for vectormath.Vector2)
- 'scale':  float, person bbox = 200*scale px
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

ACTIONS = ["Directions", "Eating", "Posing", "Walking", "Walking_1"]
CAMERAS = ["54138969", "55011271", "58860488", "60457274"]


def make_h36m_bin(
    n: int,
    seed: int = 0,
    subjects: Optional[List[str]] = None,
) -> Dict[str, list]:
    """Generate a plausible random H36M annotation dict: 3D skeletons around
    camera space z~5000 mm, 2D parts as a noisy projection-like mapping."""
    rng = np.random.RandomState(seed)
    subjects = subjects or ["S1", "S5"]

    s = rng.randn(n, 17, 3).astype(np.float32) * 200.0
    s[:, :, 2] += 5000.0
    # Pelvis anchors the skeleton near the body center.
    s[:, 0, :] = s.mean(axis=1)

    part = (s[:, :, :2] / s[:, :, 2:3]) * 1000.0 + 500.0
    part += rng.randn(n, 17, 2).astype(np.float32) * 2.0

    images = []
    for i in range(n):
        subject = subjects[i % len(subjects)]
        action = ACTIONS[i % len(ACTIONS)]
        camera = CAMERAS[i % len(CAMERAS)]
        images.append(f"{subject}_{action}.{camera}_{i:06d}.jpg")

    centers = [part[i].mean(axis=0).astype(np.float32) for i in range(n)]
    scales = [float(2.0 + rng.rand()) for _ in range(n)]

    return {
        "image": images,
        "S": [s[i] for i in range(n)],
        "part": [part[i] for i in range(n)],
        "center": centers,
        "scale": scales,
    }


def write_h36m_dataset(
    data_dir: str,
    n_train: int = 128,
    n_valid: int = 64,
    protocol: str = "GT",
    seed: int = 0,
) -> str:
    """Write ``{train,valid}_{protocol}.bin`` into ``data_dir`` and return it."""
    os.makedirs(data_dir, exist_ok=True)
    for task, n, s in [("train", n_train, seed), ("valid", n_valid, seed + 1)]:
        with open(os.path.join(data_dir, f"{task}_{protocol}.bin"), "wb") as f:
            pickle.dump(make_h36m_bin(n, seed=s), f)
    return data_dir

"""H36M image-record provider for the hourglass-FT / end2end paths
(H36M/data.py:117-162, the position_only=False branch).

Adapts an H36MSplit to the host pipeline's record interface: images live at
``{data_dir}/{subject}/{image_name}`` (H36M/data.py:134-136), keypoints are
the un-normalized 16-joint 2D parts (nose already deleted at load), all
annotated, no flip augmentation (the reference flips MPII only).

Also writes synthetic H36M image trees for tests (data/synthetic.py).
"""
from __future__ import annotations

import os

import numpy as np

from bilinear_tpu.data.h36m import H36MSplit, decode_image_name
from bilinear_tpu.data.mpii import MPIIRecord, NUM_JOINTS


class H36MImageRecords:
    """Duck-typed like MPIIAnnotations for MPIIHostPipeline: __len__,
    record(i), image_path(rec)."""

    def __init__(self, split: H36MSplit, data_dir: str):
        self.split = split
        self.data_dir = data_dir

    def __len__(self) -> int:
        return len(self.split)

    def record(self, index: int) -> MPIIRecord:
        keypoints = self.split.raw_part[index].reshape(NUM_JOINTS, 2)
        return MPIIRecord(
            image_name=self.split.images[index],
            center=self.split.centers[index].astype(np.float32),
            scale=float(self.split.scales[index]),
            head=1.0,  # PCKh head size has no H36M counterpart here
            keypoints=keypoints.astype(np.float32),
            valid=np.ones(NUM_JOINTS, bool),
            img_idx=index,
            r_idx=0,
        )

    def image_path(self, record: MPIIRecord) -> str:
        subject, _, _, _ = decode_image_name(record.image_name)
        return os.path.join(self.data_dir, subject, record.image_name)

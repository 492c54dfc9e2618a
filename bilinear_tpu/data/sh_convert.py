"""GT -> SH protocol converter: run the trained hourglass over the H36M
train+valid images and rewrite the 2D 'part' annotations with its detections.

This is the working replacement for the reference's 'SH preprocess.ipynb'
(SURVEY.md §2.3): forward each image's crop through the detector (cells 3, 6,
8), argmax-decode the last stack to image-space keypoints (cell 8), remap the
16 MPII-ordered joints into 17 H36M order with from_MPII_to_H36M — thorax
duplicated into slots 9/10, one later deleted as 'nose' by the lifting
loader (cell 7) — and pickle new ``{task}_{SH}.bin`` files with only the
'part' key rewritten (cells 10, 13). Downstream, train_bilinear with
protocol=SH lifts from these detections.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np

from bilinear_tpu.data.h36m import Annotation, load_h36m, tasks
from bilinear_tpu.data.h36m_images import H36MImageRecords
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.eval.mpii_test_export import (
    _to_original_space,
    make_export_step,
)
from bilinear_tpu.ops.joints import FROM_MPII_TO_H36M
from bilinear_tpu.utils.residency import packed_device_put


def convert_gt_to_sh(
    model,
    variables,
    data_dir: str,
    protocol_out: str = "SH",
    batch_size: int = 16,
    canvas: int = 512,
    transport: str = "u8",  # uint8 canvases: 4x less tunnel traffic than f32
    cache_canvases: bool = False,
) -> Dict[str, str]:
    """Returns {task: written_bin_path}."""
    import jax

    splits = load_h36m(data_dir, "GT")
    # Pin weights on device once — the conversion loops over the whole
    # dataset and numpy trees re-upload per batch (see eval/pckh.py).
    variables = packed_device_put(variables)
    step = make_export_step(model)
    written = {}
    for task in tasks:
        split = splits[task]
        records = H36MImageRecords(split, data_dir)
        pipeline = MPIIHostPipeline(
            records, batch_size, canvas=canvas, pad=True, transport=transport,
            cache_dir=os.path.join(data_dir, "canvas_cache", f"sh_{task}")
            if cache_canvases and transport == "u8" else None,
        )

        detections = np.zeros((len(split), 16, 2), np.float32)
        for batch in pipeline.epoch(0):
            pose_hm = np.asarray(
                step(
                    variables, batch.images, batch.centers, batch.scales,
                    batch.keypoints, batch.valid,
                )
            )
            # Original-image pixels (the GT 'part' convention the lifting
            # loader z-scores; canvas-space would drop absolute position).
            poses = _to_original_space(pose_hm, records, batch.index)
            for slot in range(poses.shape[0]):
                if batch.index[slot] >= 0:
                    detections[int(batch.index[slot])] = poses[slot]

        # 16 MPII-ordered -> 17 H36M-ordered (thorax duplicated at 9/10).
        part17 = detections[:, FROM_MPII_TO_H36M, :]

        with open(os.path.join(data_dir, f"{task}_GT.bin"), "rb") as f:
            raw = pickle.load(f)
        raw[Annotation.Part] = [part17[i] for i in range(len(split))]

        out_path = os.path.join(data_dir, f"{task}_{protocol_out}.bin")
        with open(out_path, "wb") as f:
            pickle.dump(raw, f, protocol=pickle.HIGHEST_PROTOCOL)
        written[task] = out_path
    return written

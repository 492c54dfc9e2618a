"""Official MPII test-set prediction export + the MATLAB-toolkit converter.

Rebuilds eval_hourglass.py:128-161 (per-rect ``{img_idx}.{r_idx}.txt`` files
with 16 ``joint x y`` lines, argmax decode of the last stack, centers WITHOUT
the training-time y-shift) and eval_converter.m:1-48 (inject the txt
predictions into an annolist-shaped struct and save
``pred_keypoints_mpii.mat`` for the official MPII MATLAB evaluation kit) —
the converter in Python via scipy.io, so no MATLAB is needed.
"""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np
import scipy.io

from bilinear_tpu.data.mpii import MPIITestAnnotations, _as_list
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.ops.decode import argmax_decode, heatmap_to_image_space
from bilinear_tpu.train.hourglass import preprocess_batch
from bilinear_tpu.utils.residency import packed_device_put


def make_export_step(model):
    """Crop -> forward -> argmax, returning HEATMAP-space poses (B, 16, 2).

    The mapping to pixel coordinates deliberately happens on the host with
    each record's ORIGINAL-image center/scale: the pipeline's batch
    centers/scales are canvas-space (record_to_canvas subtracts the crop
    offset and divides by the downscale factor), so decoding with them
    yields canvas coordinates — the official MPII toolkit and the SH bins
    need original-frame pixels (eval_hourglass.py:148-156). The crop seen
    by the network is geometrically identical either way, so
    heatmap_to_image_space(pose_hm, original_center, original_scale) is
    exact."""

    @jax.jit
    def step(variables, images, centers, scales, keypoints, valid):
        crops, _, _ = preprocess_batch(
            jax.random.PRNGKey(0), images, centers, scales, keypoints, valid,
            augment=False,
        )
        out = model.apply(variables, crops, train=False)[-1]  # (B, H, W, J)
        hm = jnp.transpose(out, (0, 3, 1, 2))
        return argmax_decode(hm)

    return step


def _to_original_space(
    pose_hm: np.ndarray, annotations, index: np.ndarray
) -> np.ndarray:
    """Map heatmap-space poses to original-image pixels using each slot's
    ORIGINAL record center/scale (padded slots pass through unchanged)."""
    centers = np.zeros((pose_hm.shape[0], 2), np.float32)
    scales = np.ones((pose_hm.shape[0],), np.float32)
    for slot in range(pose_hm.shape[0]):
        if index[slot] >= 0:
            rec = annotations.record(int(index[slot]))
            centers[slot] = rec.center
            scales[slot] = rec.scale
    return np.asarray(
        heatmap_to_image_space(jnp.asarray(pose_hm), centers, scales)
    )


def export_predictions(
    model,
    variables,
    annotations: MPIITestAnnotations,
    prediction_dir: str,
    batch_size: int = 8,
    canvas: int = 512,
) -> int:
    """Write one txt per test rect; returns the number of rects exported."""
    os.makedirs(prediction_dir, exist_ok=True)
    pipeline = MPIIHostPipeline(annotations, batch_size, canvas=canvas, pad=True)
    # Pin weights on device once (see eval/pckh.py — numpy trees re-upload
    # per batch otherwise).
    variables = packed_device_put(variables)
    step = make_export_step(model)
    exported = 0
    for batch in pipeline.epoch(0):
        pose_hm = np.asarray(
            step(
                variables, batch.images, batch.centers, batch.scales,
                batch.keypoints, batch.valid,
            )
        )
        poses = _to_original_space(pose_hm, annotations, batch.index)
        for slot in range(batch.images.shape[0]):
            if batch.index[slot] < 0:
                continue
            rec = annotations.record(int(batch.index[slot]))
            path = os.path.join(
                prediction_dir, f"{rec.img_idx}.{rec.r_idx}.txt"
            )
            with open(path, "w") as f:
                for joint in range(16):
                    f.write(
                        f"{joint} {poses[slot, joint, 0]} {poses[slot, joint, 1]}\n"
                    )
            exported += 1
    return exported


def convert_predictions(
    root: str,
    prediction_dir: str,
    out_path: str,
    mat_name: str = "mpii_human_pose_v1_u12_2/mpii_human_pose_v1_u12_1.mat",
) -> int:
    """Python port of eval_converter.m: build ``pred`` (the test annolist with
    predicted annopoints injected) and save it as a .mat the official MPII
    eval toolkit consumes. Returns the number of rects injected."""
    release = scipy.io.loadmat(
        os.path.join(root, mat_name), squeeze_me=True, struct_as_record=False
    )["RELEASE"]
    annolist = _as_list(release.annolist)
    img_train = np.atleast_1d(np.asarray(release.img_train))
    singles = _as_list(release.single_person)

    pred = []
    n = 0
    subset_img_idx = 0
    for img_idx in range(len(annolist)):
        if img_train[img_idx] != 0:
            continue
        subset_img_idx += 1
        rects_out = []
        rects = _as_list(annolist[img_idx].annorect)
        sp = np.atleast_1d(np.asarray(singles[img_idx])).reshape(-1)
        for r_idx, rect in enumerate(rects):
            # Real-release rects outside single_person often carry EMPTY
            # scale fields (squeeze_me yields 0-size arrays, whose truth
            # value is deprecated) — treat anything non-scalar as absent.
            s = getattr(rect, "scale", None)
            entry = {
                "scale": float(s) if np.ndim(s) == 0 and s is not None
                else 0.0,
            }
            objpos = getattr(rect, "objpos", None)
            if objpos is not None:
                try:
                    entry["objpos"] = {"x": float(objpos.x), "y": float(objpos.y)}
                except Exception:
                    objpos = None
            txt = os.path.join(
                prediction_dir, f"{subset_img_idx}.{r_idx + 1}.txt"
            )
            if objpos is not None and (r_idx + 1) in sp and os.path.exists(txt):
                m = np.loadtxt(txt)
                points = [
                    {"id": int(m[j, 0]), "x": float(m[j, 1]), "y": float(m[j, 2])}
                    for j in range(16)
                ]
                entry["annopoints"] = {"point": np.asarray(points, dtype=object)}
                n += 1
            rects_out.append(entry)
        pred.append(
            {
                "image": {"name": str(annolist[img_idx].image.name)},
                "annorect": np.asarray(rects_out, dtype=object),
            }
        )

    scipy.io.savemat(
        out_path, {"pred": np.asarray(pred, dtype=object)}, long_field_names=True
    )
    return n

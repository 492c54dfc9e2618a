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


def make_export_step(model):
    @jax.jit
    def step(variables, images, centers, scales, keypoints, valid):
        crops, _, _ = preprocess_batch(
            jax.random.PRNGKey(0), images, centers, scales, keypoints, valid,
            augment=False,
        )
        out = model.apply(variables, crops, train=False)[-1]  # (B, H, W, J)
        hm = jnp.transpose(out, (0, 3, 1, 2))
        pose = argmax_decode(hm)
        return heatmap_to_image_space(pose, centers, scales)

    return step


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
    step = make_export_step(model)
    exported = 0
    for batch in pipeline.epoch(0):
        poses = np.asarray(
            step(
                variables, batch.images, batch.centers, batch.scales,
                batch.keypoints, batch.valid,
            )
        )
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
            entry = {
                "scale": float(getattr(rect, "scale", 0.0) or 0.0),
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

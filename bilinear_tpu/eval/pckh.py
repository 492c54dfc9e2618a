"""PCKh@0.5 evaluation — the reference protocol (valid_hourglass.py:50-142)
as jitted device programs.

Protocol, preserved exactly:
- eval-mode forward on the un-augmented valid crop AND its horizontal mirror;
  average the straight heatmaps with the L/R-swapped, unflipped mirrored
  heatmaps (:85-96);
- argmax decode of the last stack's 64x64 maps -> image space via
  center + (p-32)/64*scale*200 (:100-106);
- per-joint hit if dist/head <= 0.5; report 14 joints (pelvis & spine
  dropped via the [0:6]+[10:16]+[8:10] reorder, :119-128,136) with
  NaN-masked totals (unannotated joints count in neither hit nor total).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.ops.affine import hflip
from bilinear_tpu.ops.decode import argmax_decode, flip_average, heatmap_to_image_space
from bilinear_tpu.ops.joints import PCKH_KEYPOINTS, PCKH_REORDER
from bilinear_tpu.train.hourglass import preprocess_batch
from bilinear_tpu.utils.memo import memoize_factory
from bilinear_tpu.utils.residency import packed_device_put


@memoize_factory
def make_pckh_step(model, threshold: float = 0.5):
    @jax.jit
    def step(variables, images, centers, scales, keypoints, valid, heads, real):
        crops, _, _ = preprocess_batch(
            jax.random.PRNGKey(0), images, centers, scales, keypoints, valid,
            augment=False,
        )
        # One forward over [straight; mirrored] (2B batch) instead of two
        # B-sized passes — better MXU utilization at the reference's batch 8.
        both = jnp.concatenate([crops, hflip(crops)], axis=0)
        last = model.apply(variables, both, train=False)[-1]
        out, out_f = jnp.split(last, 2, axis=0)
        # decode expects (..., J, H, W)
        hm = jnp.transpose(out, (0, 3, 1, 2))
        hm_f = jnp.transpose(out_f, (0, 3, 1, 2))
        merged = flip_average(hm, hm_f)

        pose_hm = argmax_decode(merged)
        pose_img = heatmap_to_image_space(pose_hm, centers, scales)

        dists = jnp.sqrt(jnp.sum(jnp.square(pose_img - keypoints), axis=-1))
        ratio = dists / heads[:, None]
        ratio14 = jnp.take(ratio, jnp.asarray(PCKH_REORDER), axis=-1)

        annotated = ~jnp.isnan(ratio14) & real[:, None]
        hits = jnp.where(annotated & (ratio14 <= threshold), 1, 0)
        return (
            jnp.sum(hits, axis=0),
            jnp.sum(annotated.astype(jnp.int32), axis=0),
        )

    return step


def evaluate_pckh(
    model, variables, pipeline, threshold: float = 0.5
) -> Tuple[Dict[str, float], float]:
    """Returns ({joint_name: PCKh%}, average%). ``pipeline`` must be padded
    (static shapes); padded slots are masked via batch.index == -1."""
    # Pin the weights on device ONCE: callers typically hold checkpoint-
    # restored numpy trees, and passing those into the jitted step re-ships
    # every leaf on EVERY batch (measured seconds per dispatch for the 25M-
    # param detector through a slow host link; free if already on device).
    variables = packed_device_put(variables)
    step = make_pckh_step(model, threshold)
    hit = np.zeros(14, np.int64)
    total = np.zeros(14, np.int64)
    for batch in pipeline.epoch(0):
        h, t = step(
            variables,
            batch.images,
            batch.centers,
            batch.scales,
            batch.keypoints,
            batch.valid,
            batch.heads,
            jnp.asarray(batch.index >= 0),
        )
        hit += np.asarray(h, np.int64)
        total += np.asarray(t, np.int64)

    per_joint = {
        name: float(hit[i] / total[i] * 100) if total[i] else float("nan")
        for i, name in enumerate(PCKH_KEYPOINTS)
    }
    avg = float(hit.sum() / max(total.sum(), 1) * 100)
    return per_joint, avg

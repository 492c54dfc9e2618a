"""Eval-time BatchNorm recalibration — the reference's protocol
(valid_hourglass.py:23-48) as a pure-functional streaming pass.

Reference protocol: ``reset_statistics()`` zeroes every BN running stat and
switches momentum to None (cumulative), then a full no-grad pass over the
TRAIN split in train() mode rebuilds the running statistics; only then does
eval() run. Functionally: reset the batch_stats collection, then fold each
(un-augmented, preprocessed) train batch through the model in train mode with
momentum=None, carrying batch_stats.
"""
from __future__ import annotations

import jax

from bilinear_tpu.core.norm import reset_batch_stats
from bilinear_tpu.train.hourglass import preprocess_batch
from bilinear_tpu.utils.memo import memoize_factory
from bilinear_tpu.utils.residency import packed_device_put


@memoize_factory
def make_recalibrate_step(model):
    """Returns a jitted (params, batch_stats, canvas_batch) ->
    new_batch_stats step (cumulative BN update, no gradients)."""

    @jax.jit
    def step(params, batch_stats, images, centers, scales, keypoints, valid):
        crops, _, _ = preprocess_batch(
            jax.random.PRNGKey(0),
            images,
            centers,
            scales,
            keypoints,
            valid,
            augment=False,
        )
        _, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            crops,
            train=True,
            momentum=None,  # cumulative, matching reset_statistics()
            mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    return step


def recalibrate(model, params, batch_stats, pipeline, max_batches=None):
    """Reset and rebuild batch_stats over the (augment=False) train split."""
    # One device transfer up front — a numpy params tree (the usual
    # checkpoint-restored form) would otherwise re-upload on every batch of
    # the recalibration pass (see eval/pckh.py).
    params = packed_device_put(params)
    stats = reset_batch_stats(batch_stats)
    step = make_recalibrate_step(model)
    for i, batch in enumerate(pipeline.epoch(0)):
        if max_batches is not None and i >= max_batches:
            break
        # Zero-padded tail samples (pad=True pipelines) must not enter the
        # running statistics — the reference's recalibration pass iterates
        # only real samples, and with cumulative momentum every batch gets
        # equal weight (matching the reference's short final DataLoader
        # batch). One extra compile for the odd tail shape.
        n = batch.images.shape[0] - batch.pad
        stats = step(
            params, stats, batch.images[:n], batch.centers[:n],
            batch.scales[:n], batch.keypoints[:n], batch.valid[:n],
        )
    return stats

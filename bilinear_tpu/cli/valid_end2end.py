"""MPJPE evaluation of the jointly trained fused End2End model.

The reference has no working end-to-end eval (its whole end2end path is a
broken sketch — model/end2end.py:5-43, train_end2end.py; SURVEY.md §2.3).
This evaluates the intent the sketch documents: frames -> fused
hourglass -> softargmax -> lifting -> 3D, scored with the reference's MPJPE
protocol (valid_bilinear.py:51-83 — un-normalize with TRAIN-split stats,
per-sample Euclidean distance summed over 16 joints, per-action merge).

Batch preparation mirrors cli/train_end2end.py exactly with augmentation
off (no scale jitter / color jitter, eval-mode BN + no dropout), so the
metric scores the distribution the joint trainer optimized.
"""
from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from bilinear_tpu.config import HourglassFTConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.data.h36m_images import H36MImageRecords
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.io.checkpoint import resume_or_init_fast
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.ops.affine import crop_batch
from bilinear_tpu.train.end2end import End2EndTrainer
from bilinear_tpu.utils.residency import packed_device_put


def main(argv=None) -> None:
    cfg = parse_config(HourglassFTConfig(), argv)
    cfg.comment = cfg.comment if cfg.comment != "Hourglass FT" else "End2End"
    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    splits = load_h36m(cfg.data_dir, "GT")
    train, valid = splits[Task.Train], splits[Task.Valid]
    records = H36MImageRecords(valid, cfg.data_dir)
    pipeline = MPIIHostPipeline(
        records, cfg.batch_size, canvas=cfg.canvas, pad=True,
        transport=cfg.transport,
        cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "e2e_valid")
        if cfg.cache_canvases and cfg.transport == "u8" else None,
    )

    trainer = End2EndTrainer(
        variant="torch7" if cfg.variant == "torch7" else "preact",
        batch_size=cfg.batch_size,
    )
    mean_part = jnp.asarray(train.mean_part)
    std_part = jnp.asarray(train.std_part)
    state, epoch = resume_or_init_fast(
        lambda k: trainer.init_state(k, mean_part, std_part),
        jax.random.PRNGKey(cfg.seed), parameter_dir,
    )
    logger.info("Evaluating End2End epoch %d", epoch)
    variables = packed_device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    model = trainer.model

    # Original-image-space crop boxes for the fused decode (the lifting
    # stats are original-space statistics; see End2EndTrainer._train_step).
    orig_centers = np.asarray(valid.centers, np.float32)
    orig_scales = np.asarray(valid.scales, np.float32)

    @jax.jit
    def eval_step(variables, images, centers, scales, dec_centers, dec_scales):
        crops = crop_batch(
            images, centers, scales, jnp.zeros(scales.shape[0]), res=256
        )
        _, _, pose3d = model.apply(
            variables, crops, dec_centers, dec_scales, mean_part, std_part,
            train=False,
        )
        return pose3d

    std_s = jnp.asarray(valid.std_s)
    mean_s = jnp.asarray(valid.mean_s)
    names = valid.action_names
    n_actions = len(names)
    dist_sum = np.zeros(n_actions, np.float64)
    count = np.zeros(n_actions, np.int64)
    for batch in pipeline.epoch(0):
        safe = np.maximum(batch.index, 0)  # pad slots -> any real record
        pose3d = eval_step(
            variables, batch.images, batch.centers, batch.scales,
            jnp.asarray(orig_centers[safe]), jnp.asarray(orig_scales[safe]),
        )
        pred_mm = np.asarray(pose3d * std_s + mean_s)
        for slot in range(pred_mm.shape[0]):
            i = int(batch.index[slot])
            if i < 0:
                continue  # zero-padded eval slot
            gt = valid.raw_s[i].reshape(16, 3)
            pr = pred_mm[slot].reshape(16, 3)
            dist = float(np.linalg.norm(pr - gt, axis=1).sum())
            a = int(valid.actions[i])
            dist_sum[a] += dist
            count[a] += 1

    per_action = {
        names[a]: float(dist_sum[a] / (count[a] * 16))
        for a in range(n_actions) if count[a]
    }
    overall = float(dist_sum.sum() / (count.sum() * 16))
    logger.info("=" * 59)
    for action, mpjpe in per_action.items():
        logger.info("%s: %f", action, mpjpe)
    logger.info("avg: %f", overall)
    logger.info("=" * 59)
    with open(os.path.join(log_dir, f"mpjpe_e2e_epoch{epoch}.json"), "w") as f:
        json.dump(
            {"epoch": epoch, "overall": overall, "per_action": per_action}, f
        )


if __name__ == "__main__":
    main()

"""PCKh-style evaluation of the fine-tuned hourglass on the H36M valid split.

The reference's valid_hourglass_FT.py documents this intent but crashes on
undefined variables (SURVEY.md §2.3 — centers/scales/keypoints/heads never
bound for the H36M loader). This is the working rebuild of that intent:
BN-recalibration over the H36M train images, flip-free TTA-less forward
(H36M is never flipped), argmax decode to image space, and a PCKh-style
score.

H36M has no annotated head rectangle, so the PCKh normalizer uses a
documented proxy: head = 0.6 * ||Head - Thorax|| from the GT 2D keypoints in
MPII joint order (channels were remapped with from_H36M_to_MPII during FT).
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

from bilinear_tpu.config import HourglassFTConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.data.h36m_images import H36MImageRecords
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.eval.pckh import evaluate_pckh
from bilinear_tpu.eval.recalibrate import recalibrate
from bilinear_tpu.io.checkpoint import resume_or_init_fast
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.ops.joints import FROM_H36M_TO_MPII
from bilinear_tpu.train.hourglass import HourglassTrainer


class _FTRecords(H36MImageRecords):
    """H36M records with MPII-ordered keypoints and the head proxy."""

    HEAD_JOINT = 9  # MPII order
    THORAX_JOINT = 8

    def record(self, index: int):
        rec = super().record(index)
        kp = rec.keypoints[np.asarray(FROM_H36M_TO_MPII)]
        head = 0.6 * float(
            np.linalg.norm(kp[self.HEAD_JOINT] - kp[self.THORAX_JOINT])
        )
        rec.keypoints = kp
        rec.valid = rec.valid[np.asarray(FROM_H36M_TO_MPII)]
        rec.head = max(head, 1e-3)
        return rec


def main(argv=None) -> None:
    cfg = parse_config(HourglassFTConfig(), argv)
    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    trainer = HourglassTrainer(variant=cfg.variant, batch_size=cfg.batch_size,
                               n_stacks=cfg.n_stacks, features=cfg.features,
                               depth=cfg.depth,
                               n_modules=cfg.n_modules)
    state, epoch = resume_or_init_fast(
        trainer.init_state, jax.random.PRNGKey(cfg.seed), parameter_dir
    )
    logger.info("Evaluating FT epoch %d", epoch)

    splits = load_h36m(cfg.data_dir, "GT")
    train_pipe = MPIIHostPipeline(
        _FTRecords(splits[Task.Train], cfg.data_dir), cfg.batch_size, pad=True,
        transport=cfg.transport,
    )
    stats = recalibrate(trainer.model, state.params, state.batch_stats, train_pipe)

    valid_pipe = MPIIHostPipeline(
        _FTRecords(splits[Task.Valid], cfg.data_dir), cfg.batch_size, pad=True,
        transport=cfg.transport,
    )
    per_joint, avg = evaluate_pckh(
        trainer.model, {"params": state.params, "batch_stats": stats}, valid_pipe
    )

    logger.info("=" * 59)
    for joint, pckh in per_joint.items():
        logger.info("%s: %f", joint, pckh)
    logger.info("avg: %f", avg)
    logger.info("=" * 59)
    with open(os.path.join(log_dir, f"pckh_ft_epoch{epoch}.json"), "w") as f:
        json.dump({"epoch": epoch, "avg": avg, "per_joint": per_joint}, f)


if __name__ == "__main__":
    main()

"""Evaluate MPII PCKh@0.5 — the reference's valid_hourglass.py entry point:
BN-recalibration pass over the train split, then flip-TTA argmax evaluation
over the valid split (valid_hourglass.py:23-142).
"""
from __future__ import annotations

import json
import os

import jax

from bilinear_tpu.config import HourglassConfig, parse_config
from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.eval.pckh import evaluate_pckh
from bilinear_tpu.eval.recalibrate import recalibrate
from bilinear_tpu.io.checkpoint import resume_or_init_fast
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.train.hourglass import HourglassTrainer


def main(argv=None) -> None:
    cfg = parse_config(HourglassConfig(), argv)
    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    trainer = HourglassTrainer(variant=cfg.variant, batch_size=cfg.batch_size,
                               n_stacks=cfg.n_stacks, features=cfg.features,
                               depth=cfg.depth,
                               n_modules=cfg.n_modules)
    state, epoch = resume_or_init_fast(
        trainer.init_state, jax.random.PRNGKey(cfg.seed), parameter_dir
    )
    logger.info("Evaluating epoch %d (variant %s)", epoch, cfg.variant)

    # BN recalibration over the un-augmented TRAIN split
    # (valid_hourglass.py:23-48).
    train_pipe = MPIIHostPipeline(
        MPIIAnnotations(cfg.data_dir, Task.Train), cfg.batch_size, pad=True,
        transport=cfg.transport, canvas=cfg.canvas,
        cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "train")
        if cfg.cache_canvases else None,
    )
    stats = recalibrate(trainer.model, state.params, state.batch_stats, train_pipe)

    valid_pipe = MPIIHostPipeline(
        MPIIAnnotations(cfg.data_dir, Task.Valid), cfg.batch_size, pad=True,
        transport=cfg.transport, canvas=cfg.canvas,
        cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "valid")
        if cfg.cache_canvases else None,
    )
    variables = {"params": state.params, "batch_stats": stats}
    per_joint, avg = evaluate_pckh(trainer.model, variables, valid_pipe)

    logger.info("=" * 59)
    for joint, pckh in per_joint.items():
        logger.info("%s: %f", joint, pckh)
    logger.info("avg: %f", avg)
    logger.info("=" * 59)

    with open(os.path.join(log_dir, f"pckh_epoch{epoch}.json"), "w") as f:
        json.dump({"epoch": epoch, "avg": avg, "per_joint": per_joint}, f)


if __name__ == "__main__":
    main()

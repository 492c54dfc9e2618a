"""Evaluate H36M MPJPE — the reference's valid_bilinear.py entry point.

Loads the newest checkpoint from ``{save_root}/{comment}/parameter``, runs the
eval-mode model over the valid split, and logs per-action + overall MPJPE in
mm with sub-action suffixes merged (valid_bilinear.py:51-83).
"""
from __future__ import annotations

import json
import os

import jax

from bilinear_tpu.config import BilinearConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.eval.mpjpe import evaluate_mpjpe
from bilinear_tpu.io.checkpoint import resume_or_init_fast
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.train.bilinear import BilinearTrainer


def main(argv=None) -> None:
    cfg = parse_config(BilinearConfig(), argv)
    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    splits = load_h36m(cfg.data_dir, cfg.protocol)
    valid = splits[Task.Valid]

    trainer = BilinearTrainer(batch_size=cfg.batch_size)
    state, epoch = resume_or_init_fast(
        trainer.init_state, jax.random.PRNGKey(cfg.seed), parameter_dir
    )
    logger.info("Evaluating epoch %d", epoch)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    per_action, overall = evaluate_mpjpe(trainer.model, variables, valid)

    logger.info("=" * 59)
    for action, mpjpe in per_action.items():
        logger.info("%s: %f", action, mpjpe)
    logger.info("avg: %f", overall)
    logger.info("=" * 59)

    # Machine-readable results next to the checkpoints (SURVEY.md §5 metrics).
    with open(os.path.join(log_dir, f"mpjpe_epoch{epoch}.json"), "w") as f:
        json.dump({"epoch": epoch, "overall": overall, "per_action": per_action}, f)


if __name__ == "__main__":
    main()

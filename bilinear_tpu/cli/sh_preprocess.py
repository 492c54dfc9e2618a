"""Produce the SH-protocol bins from a trained hourglass — the working
replacement for the reference's 'SH preprocess.ipynb' notebook.

Usage: python -m bilinear_tpu.cli.sh_preprocess --data-dir data/Human3.6M \
       [--comment Hourglass --variant torch7 --protocol-out SH]

Afterwards: python -m bilinear_tpu.cli.train_bilinear --protocol SH ...
"""
from __future__ import annotations

import argparse
import os

import jax

from bilinear_tpu.config import HourglassConfig, parse_config
from bilinear_tpu.data.sh_convert import convert_gt_to_sh
from bilinear_tpu.io.checkpoint import resume_or_init_fast
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.train.hourglass import HourglassTrainer


def main(argv=None) -> None:
    cfg = parse_config(HourglassConfig(), argv)
    extra = argparse.ArgumentParser()
    extra.add_argument("--h36m-dir", default="data/Human3.6M")
    extra.add_argument("--protocol-out", default="SH")
    args, _ = extra.parse_known_args(argv)

    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    trainer = HourglassTrainer(variant=cfg.variant, batch_size=cfg.batch_size,
                               n_stacks=cfg.n_stacks, features=cfg.features,
                               depth=cfg.depth,
                               n_modules=cfg.n_modules)
    state, epoch = resume_or_init_fast(
        trainer.init_state, jax.random.PRNGKey(cfg.seed), parameter_dir
    )
    logger.info("Converting GT->%s with hourglass epoch %d", args.protocol_out, epoch)

    written = convert_gt_to_sh(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        args.h36m_dir,
        protocol_out=args.protocol_out,
        batch_size=cfg.batch_size,
        canvas=cfg.canvas,
        transport=cfg.transport,
        cache_canvases=cfg.cache_canvases,
    )
    for task, path in written.items():
        logger.info("%s -> %s", task, path)


if __name__ == "__main__":
    main()

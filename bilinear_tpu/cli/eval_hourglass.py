"""Official MPII test-set inference — the reference's eval_hourglass.py.

Flow (eval_hourglass.py:19-57,128-161): load the newest checkpoint; if
training isn't finalized yet, run the one-time BN finalization (cumulative
recalibration over the train split) and save the ``epoch = -1`` 'training
over' sentinel; then run argmax inference over the official test rects and
write per-rect ``{img_idx}.{r_idx}.txt`` predictions. Optionally also runs
the converter to produce ``pred_keypoints_mpii.mat`` (replacing
eval_converter.m — no MATLAB required).
"""
from __future__ import annotations

import os

import jax

from bilinear_tpu.config import HourglassConfig, parse_config
from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations, MPIITestAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.eval.mpii_test_export import convert_predictions, export_predictions
from bilinear_tpu.eval.recalibrate import recalibrate
from bilinear_tpu.io.checkpoint import (
    FINALIZED_EPOCH,
    is_finalized,
    load_checkpoint,
    mark_finalized,
    restore_state,
    resume_or_init_fast,
)
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.train.hourglass import HourglassTrainer


def main(argv=None) -> None:
    import argparse

    cfg = parse_config(HourglassConfig(), argv)
    extra = argparse.ArgumentParser()
    # eval_hourglass.py:131 exposes eval_on_training_and_valid_subset.
    extra.add_argument("--train-subset", action="store_true",
                       help="export predictions for train/valid images "
                            "instead of the official test set")
    opts, _ = extra.parse_known_args(argv)
    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")
    prediction_dir = os.path.join(log_dir, "prediction")

    trainer = HourglassTrainer(variant=cfg.variant, batch_size=cfg.batch_size,
                               n_stacks=cfg.n_stacks, features=cfg.features,
                               depth=cfg.depth,
                               n_modules=cfg.n_modules)
    init_fn, init_key = trainer.init_state, jax.random.PRNGKey(cfg.seed)
    state, epoch = resume_or_init_fast(init_fn, init_key, parameter_dir)

    if is_finalized(parameter_dir):
        # Reuse the finalized BN statistics (epoch = -1 sentinel).
        logger.info("Using finalized BN statistics (-1.save)")
        state = restore_state(
            jax.eval_shape(init_fn, init_key),
            load_checkpoint(parameter_dir, FINALIZED_EPOCH),
        )
    else:
        logger.info("Finalizing BN statistics over the train split (one-time)")
        train_pipe = MPIIHostPipeline(
            MPIIAnnotations(cfg.data_dir, Task.Train), cfg.batch_size, pad=True,
            transport=cfg.transport, canvas=cfg.canvas,
            cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "train")
            if cfg.cache_canvases else None,
        )
        stats = recalibrate(
            trainer.model, state.params, state.batch_stats, train_pipe
        )
        state = state.replace(batch_stats=stats)
        mark_finalized(parameter_dir, state)

    annotations = MPIITestAnnotations(cfg.data_dir, train_subset=opts.train_subset)
    logger.info("Exporting %d test rects", len(annotations))
    n = export_predictions(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        annotations,
        prediction_dir,
        batch_size=cfg.batch_size,
    )
    logger.info("Wrote %d prediction files to %s", n, prediction_dir)

    out_mat = os.path.join(log_dir, "pred_keypoints_mpii.mat")
    injected = convert_predictions(cfg.data_dir, prediction_dir, out_mat)
    logger.info("Converter injected %d rects -> %s", injected, out_mat)


if __name__ == "__main__":
    main()

"""Joint end-to-end training CLI — working rebuild of train_end2end.py.

Initializes the fused model from the separately trained hourglass/bilinear
checkpoints when available (the reference's ``config.pretrained`` intent,
model/end2end.py:28-31), then trains both jointly on H36M images.
"""
from __future__ import annotations

import argparse
import contextlib
import os

import numpy as np

import jax
import jax.numpy as jnp

from bilinear_tpu.config import HourglassFTConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.data.h36m_images import H36MImageRecords
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.io.checkpoint import (
    latest_epoch,
    load_checkpoint,
    prune_checkpoints,
    resume_or_init_fast,
    save_checkpoint,
)
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.io.tensorboard import TBWriter
from bilinear_tpu.train.end2end import End2EndTrainer
from bilinear_tpu.utils.debug import debug_mode
from bilinear_tpu.utils.preempt import GracefulShutdown


def _maybe_warm_start(state, save_root, logger):
    """Copy params/batch_stats from 'Hourglass' and 'Bilinear GT' run dirs if
    checkpoints exist there (pretrained warm start)."""
    import flax.serialization as ser

    for name, run in [("hourglass", "Hourglass"), ("bilinear", "Bilinear GT")]:
        pdir = os.path.join(save_root, run, "parameter")
        epoch = latest_epoch(pdir)
        if epoch > 0:
            payload = load_checkpoint(pdir, epoch)
            params = dict(state.params)
            stats = dict(state.batch_stats)
            params[name] = ser.from_state_dict(
                state.params[name], payload["state"]["params"]
            )
            stats[name] = ser.from_state_dict(
                state.batch_stats[name], payload["state"]["batch_stats"]
            )
            state = state.replace(params=params, batch_stats=stats)
            logger.info("Warm-started %s from %s (epoch %d)", name, pdir, epoch)
    return state


def main(argv=None) -> None:
    cfg = parse_config(HourglassFTConfig(), argv)
    extra = argparse.ArgumentParser()
    extra.add_argument("--lambda-3d", type=float, default=1.0)
    args, _ = extra.parse_known_args(argv)

    cfg.comment = cfg.comment if cfg.comment != "Hourglass FT" else "End2End"
    logger, log_dir, _ = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    splits = load_h36m(cfg.data_dir, "GT")
    train = splits[Task.Train]
    records = H36MImageRecords(train, cfg.data_dir)
    if len(records) < cfg.batch_size:
        raise SystemExit(
            f"train split has {len(records)} samples < batch size "
            f"{cfg.batch_size}: drop_last would yield zero steps per epoch"
        )
    pipeline = MPIIHostPipeline(
        records, cfg.batch_size, canvas=cfg.canvas, shuffle=True,
        seed=cfg.seed, drop_last=True, transport=cfg.transport,
        cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "e2e_train")
        if cfg.cache_canvases and cfg.transport == "u8" else None,
    )

    trainer = End2EndTrainer(
        variant="torch7" if cfg.variant == "torch7" else "preact",
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        lambda_3d=args.lambda_3d,
    )
    mean_part = jnp.asarray(train.mean_part)
    std_part = jnp.asarray(train.std_part)
    state, start_epoch = resume_or_init_fast(
        lambda k: trainer.init_state(k, mean_part, std_part),
        jax.random.PRNGKey(cfg.seed), parameter_dir,
    )
    if start_epoch == 0:
        state = _maybe_warm_start(state, cfg.save_root, logger)
    else:
        logger.info("Resumed from epoch %d", start_epoch)

    s_norm_all = jnp.asarray(train.s)
    # Original-image-space crop boxes, indexed per batch: the fused decode
    # must produce keypoints in the space the lifting stats describe (see
    # End2EndTrainer._train_step docstring).
    orig_centers = jnp.asarray(np.asarray(train.centers, np.float32))
    orig_scales = jnp.asarray(np.asarray(train.scales, np.float32))
    writer = TBWriter(log_dir)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    with GracefulShutdown(logger) as shutdown:
        for epoch in range(start_epoch + 1, start_epoch + cfg.epochs_per_run + 1):
            # debug_mode() is a one-shot generator context — one per epoch.
            with debug_mode() if cfg.debug_nans else contextlib.nullcontext():
                for batch in pipeline.epoch(epoch):
                    state, loss, hm_loss, loss_3d = trainer.train_step(
                        state,
                        {
                            "images": batch.images,
                            "centers": batch.centers,
                            "scales": batch.scales,
                            "keypoints": batch.keypoints,
                            "valid": batch.valid,
                            "s_norm": s_norm_all[jnp.asarray(batch.index)],
                            "decode_centers": orig_centers[
                                jnp.asarray(batch.index)
                            ],
                            "decode_scales": orig_scales[
                                jnp.asarray(batch.index)
                            ],
                        },
                        (mean_part, std_part),
                        jax.random.fold_in(rng, epoch),
                    )
            save_checkpoint(parameter_dir, epoch, state)
            prune_checkpoints(parameter_dir, cfg.keep_checkpoints, cfg.keep_every)
            writer.scalar("E2E/loss", float(loss), int(state.step))
            writer.scalar("E2E/heatmap", float(hm_loss), int(state.step))
            writer.scalar("E2E/3d", float(loss_3d), int(state.step))
            logger.info(
                "Epoch %d saved (loss %f = hm %f + 3d %f)",
                epoch, float(loss), float(hm_loss), float(loss_3d),
            )
            if shutdown.requested:
                break  # epoch checkpointed; auto-resume continues from it
    writer.close()


if __name__ == "__main__":
    main()

"""Train the stacked-hourglass detector on MPII — the reference's
train_hourglass.py entry point, TPU-native.

Usage: python -m bilinear_tpu.cli.train_hourglass [--data-dir data/MPII
       --batch-size 8 --epochs-per-run 10 --variant torch7 ...]
"""
from __future__ import annotations

import contextlib
import os
import time

import jax
import jax.numpy as jnp

from bilinear_tpu.config import HourglassConfig, parse_config
from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.io.checkpoint import (
    prune_checkpoints,
    resume_or_init_fast,
    save_checkpoint,
)
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.io.tensorboard import TBWriter
from bilinear_tpu.io.visualize import heatmap_overlay
from bilinear_tpu.parallel import mesh as mesh_lib
from bilinear_tpu.train.hourglass import HourglassTrainer, preprocess_batch
from bilinear_tpu.utils.debug import debug_mode
from bilinear_tpu.utils.preempt import GracefulShutdown, global_requested
from bilinear_tpu.utils.profiling import Timer


def main(argv=None) -> None:
    cfg = parse_config(HourglassConfig(), argv)
    # Multi-host: --coordinator host:port --num-processes N --process-id i on
    # every process; training then runs DP over the global device mesh with
    # each process feeding its contiguous slice of every batch.
    distributed = mesh_lib.maybe_init_distributed(cfg)
    mesh = mesh_lib.make_mesh() if distributed else None
    logger, log_dir, comment = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    logger.info("=" * 59)
    logger.info("Architecture   : StackedHourglass[%s] (TPU-native)", cfg.variant)
    logger.info("   -devices    : %s", jax.devices())
    logger.info("Data           : MPII @ %s", cfg.data_dir)
    logger.info("   -mini batch : %d", cfg.batch_size)
    logger.info("=" * 59)

    annotations = MPIIAnnotations(cfg.data_dir, Task.Train)
    pipeline = MPIIHostPipeline(
        annotations, cfg.batch_size, canvas=cfg.canvas, shuffle=True,
        seed=cfg.seed, transport=cfg.transport,
        cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "train")
        if cfg.cache_canvases else None,
    )

    trainer = HourglassTrainer(
        variant=cfg.variant,
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        mesh=mesh,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
        canvas=cfg.canvas,
        n_stacks=cfg.n_stacks,
        features=cfg.features,
        depth=cfg.depth,
        n_modules=cfg.n_modules,
        fused_blocks=cfg.fused_blocks,
    )
    state, start_epoch = resume_or_init_fast(
        trainer.init_state, jax.random.PRNGKey(cfg.seed), parameter_dir,
        pack=not distributed,
    )
    if distributed:
        # Host (numpy) leaves are treated as replicated by jit over the
        # global mesh; process-local device arrays would not be addressable.
        state = jax.device_get(state)
    if start_epoch:
        logger.info("Resumed from epoch %d (step %d)", start_epoch, int(state.step))

    primary = jax.process_index() == 0
    writer = TBWriter(log_dir)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    timer = Timer()
    shutdown = GracefulShutdown(logger)

    # TB heatmap overlays (train_hourglass.py:84-89) as ONE jitted program
    # over the device-resident state. An eager flax apply here costs minutes
    # per epoch on a tunneled TPU (every op is a remote dispatch and numpy
    # weights re-upload per op); jitted it is milliseconds after the (cached)
    # first compile.
    @jax.jit
    def tb_overlay_forward(params, batch_stats, images, centers, scales,
                           keypoints, valid):
        crops, targets, _ = preprocess_batch(
            jax.random.PRNGKey(0), images, centers, scales, keypoints,
            valid, augment=False,
        )
        pred = trainer.model.apply(
            {"params": params, "batch_stats": batch_stats}, crops, train=False
        )
        return crops, jnp.transpose(targets, (0, 2, 3, 1))[None], pred
    with shutdown:
        for epoch in range(start_epoch + 1, start_epoch + cfg.epochs_per_run + 1):
            timer.start()
            with debug_mode() if cfg.debug_nans else contextlib.nullcontext():
                state, loss = trainer.fit_epoch(
                    state, pipeline, epoch, jax.random.fold_in(rng, epoch),
                    log_every=50, logger=logger, group=cfg.steps_per_dispatch,
                )
            loss = float(loss)  # host fetch: the epoch's work is done here
            timer.stop(items=len(annotations))
            if primary:  # checkpoint/TB/log are primary-only artifacts
                t0 = time.time()
                save_checkpoint(parameter_dir, epoch, state)
                prune_checkpoints(parameter_dir, cfg.keep_checkpoints,
                                  cfg.keep_every)
                t_save = time.time() - t0
                writer.scalar("HG/loss", loss, int(state.step))

                # Heatmap-overlay TB images, as in train_hourglass.py:84-89.
                # In multi-process DP the state is host (numpy) leaves, so
                # this stays a process-local program on process 0; single-
                # process it consumes the device-resident state directly.
                t0 = time.time()
                batch = next(iter(pipeline.epoch(epoch)))
                crops, tgt, pred = tb_overlay_forward(
                    state.params, state.batch_stats,
                    jnp.asarray(batch.images), jnp.asarray(batch.centers),
                    jnp.asarray(batch.scales), jnp.asarray(batch.keypoints),
                    jnp.asarray(batch.valid),
                )
                writer.image(f"{comment}/train/ground-truth",
                             heatmap_overlay(crops, tgt), int(state.step))
                writer.image(f"{comment}/train/prediction",
                             heatmap_overlay(crops, pred), int(state.step))
                logger.info(
                    "Epoch %d saved (loss: %f, epoch %.1f img/s, "
                    "ckpt %.1fs, tb %.1fs)",
                    epoch, loss, timer.last_items_per_sec, t_save,
                    time.time() - t0,
                )
            # Multi-host runs agree on the flag (any signaled process stops
            # all), else the un-signaled rest hang in the next collectives.
            shutdown.log_pending()
            if global_requested(shutdown.requested):
                break  # epoch is checkpointed; auto-resume continues from it

    writer.close()


if __name__ == "__main__":
    main()

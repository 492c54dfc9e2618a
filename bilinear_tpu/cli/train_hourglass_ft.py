"""Fine-tune the pre-activation hourglass on H36M GT heatmaps — the
reference's train_hourglass_FT.py entry point.

Parity: trains model.hourglass (the 'preact' variant, train_hourglass_FT.py:47)
on H36M images with position_only=False-style preprocessing (H36M/data.py:
117-162 — scale/rotation augmentation, ColorJitter, NO flip), target heatmap
channels reordered H36M -> MPII via from_H36M_to_MPII (train_hourglass_FT.py:
65,77), sum-of-stacks MSE, RMSprop 2.5e-4, clip 1.0, 100 epochs per
invocation (:67).
"""
from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

from bilinear_tpu.config import HourglassFTConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.data.h36m_images import H36MImageRecords
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.io.checkpoint import (
    prune_checkpoints,
    resume_or_init_fast,
    save_checkpoint,
)
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.io.tensorboard import TBWriter
from bilinear_tpu.ops.joints import FROM_H36M_TO_MPII
from bilinear_tpu.parallel import mesh as mesh_lib
from bilinear_tpu.train.hourglass import HourglassTrainer
from bilinear_tpu.utils.debug import debug_mode
from bilinear_tpu.utils.preempt import GracefulShutdown, global_requested


def main(argv=None) -> None:
    cfg = parse_config(HourglassFTConfig(), argv)
    # Multi-host DP (same flags/semantics as cli/train_hourglass.py).
    distributed = mesh_lib.maybe_init_distributed(cfg)
    mesh = mesh_lib.make_mesh() if distributed else None
    logger, log_dir, comment = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    logger.info("Fine-tuning hourglass[%s] on H36M heatmaps @ %s",
                cfg.variant, cfg.data_dir)

    splits = load_h36m(cfg.data_dir, "GT")
    records = H36MImageRecords(splits[Task.Train], cfg.data_dir)
    pipeline = MPIIHostPipeline(
        records, cfg.batch_size, shuffle=True, seed=cfg.seed,
        transport=cfg.transport, canvas=cfg.canvas,
        cache_dir=os.path.join(cfg.data_dir, "canvas_cache", "ft_train")
        if cfg.cache_canvases else None,
    )

    trainer = HourglassTrainer(
        variant=cfg.variant,
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        mesh=mesh,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
        joint_remap=FROM_H36M_TO_MPII,
        flip_prob=0.0,  # the reference never flips H36M
        n_stacks=cfg.n_stacks,
        features=cfg.features,
        depth=cfg.depth,
        n_modules=cfg.n_modules,
    )
    state, start_epoch = resume_or_init_fast(
        trainer.init_state, jax.random.PRNGKey(cfg.seed), parameter_dir,
        pack=not distributed,
    )
    if distributed:
        state = jax.device_get(state)  # numpy leaves == replicated under jit
    if start_epoch:
        logger.info("Resumed from epoch %d (step %d)", start_epoch, int(state.step))

    primary = jax.process_index() == 0
    writer = TBWriter(log_dir)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    shutdown = GracefulShutdown(logger)
    with shutdown:
        for epoch in range(start_epoch + 1, start_epoch + cfg.epochs_per_run + 1):
            with debug_mode() if cfg.debug_nans else contextlib.nullcontext():
                state, loss = trainer.fit_epoch(
                    state, pipeline, epoch, jax.random.fold_in(rng, epoch),
                    log_every=100, logger=logger, group=cfg.steps_per_dispatch,
                )
            if primary:  # checkpoint/TB/log are primary-only artifacts
                save_checkpoint(parameter_dir, epoch, state)
                prune_checkpoints(parameter_dir, cfg.keep_checkpoints,
                                  cfg.keep_every)
                writer.scalar("FT/loss", float(loss), int(state.step))
                logger.info("Epoch %d saved (loss: %f)", epoch, float(loss))
            # Multi-host runs agree on the flag (any signaled process stops
            # all), else the un-signaled rest hang in the next collectives.
            shutdown.log_pending()
            if global_requested(shutdown.requested):
                break  # epoch is checkpointed; auto-resume continues from it
    writer.close()


if __name__ == "__main__":
    main()

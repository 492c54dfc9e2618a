"""Train the bilinear lifting network on H36M — the reference's
train_bilinear.py entry point, TPU-native.

Usage:  python -m bilinear_tpu.cli.train_bilinear [--data-dir ... --protocol GT
        --batch-size 64 --epochs-per-run 10 --comment "Bilinear GT" ...]

Runs ``epochs_per_run`` epochs (reference: 10 per invocation, driven 40x by
bilinear.sh), auto-resuming from the newest checkpoint in
``{save_root}/{comment}/parameter`` and checkpointing every epoch.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from bilinear_tpu.config import BilinearConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.io.checkpoint import resume_or_init, save_checkpoint
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.io.tensorboard import TBWriter
from bilinear_tpu.train.bilinear import BilinearTrainer


def main(argv=None) -> None:
    cfg = parse_config(BilinearConfig(), argv)
    logger, log_dir, comment = get_logger(cfg.comment, cfg.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")

    logger.info("=" * 59)
    logger.info("Architecture   : Bilinear (TPU-native)")
    logger.info("   -protocol   : %s", cfg.protocol)
    logger.info("   -devices    : %s", jax.devices())
    logger.info("Data           : Human3.6M @ %s", cfg.data_dir)
    logger.info("   -mini batch : %d", cfg.batch_size)
    logger.info("=" * 59)

    splits = load_h36m(cfg.data_dir, cfg.protocol)
    train = splits[Task.Train]
    x = jnp.asarray(train.part)
    y = jnp.asarray(train.s)

    trainer = BilinearTrainer(
        batch_size=cfg.batch_size,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
    template = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    state, start_epoch = resume_or_init(template, parameter_dir)
    if start_epoch:
        logger.info("Resumed from epoch %d (step %d)", start_epoch, int(state.step))

    writer = TBWriter(log_dir)

    def on_epoch_end(epoch: int, st, last_loss: float):
        save_checkpoint(parameter_dir, epoch, st)
        writer.scalar("BI/loss", last_loss, int(st.step))
        logger.info("Epoch %d saved (loss: %f)", epoch, last_loss)

    import contextlib

    from bilinear_tpu.utils.profiling import trace

    t0 = time.time()
    profile_ctx = trace(log_dir) if cfg.profile else contextlib.nullcontext()
    with profile_ctx:
        state = trainer.fit(
            state,
            x,
            y,
            epochs=cfg.epochs_per_run,
            rng=jax.random.PRNGKey(cfg.seed + 1),
            start_epoch=start_epoch,
            on_epoch_end=on_epoch_end,
        )
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    n_steps = cfg.epochs_per_run * -(-len(train) // cfg.batch_size)
    logger.info(
        "%d epochs in %.1fs (%.0f poses/sec)",
        cfg.epochs_per_run,
        dt,
        cfg.epochs_per_run * len(train) / dt,
    )
    writer.close()


if __name__ == "__main__":
    main()

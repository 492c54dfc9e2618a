"""Train the bilinear lifting network on H36M — the reference's
train_bilinear.py entry point, TPU-native.

Usage:  python -m bilinear_tpu.cli.train_bilinear [--data-dir ... --protocol GT
        --batch-size 64 --epochs-per-run 10 --comment "Bilinear GT" ...]

Runs ``epochs_per_run`` epochs (reference: 10 per invocation, driven 40x by
bilinear.sh), auto-resuming from the newest checkpoint in
``{save_root}/{comment}/parameter`` and checkpointing every epoch.
"""
from __future__ import annotations

import contextlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.config import BilinearConfig, parse_config
from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.io.checkpoint import (
    prune_checkpoints,
    resume_or_init_fast,
    save_checkpoint,
)
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.io.tensorboard import TBWriter
from bilinear_tpu.parallel import mesh as mesh_lib
from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.utils.debug import debug_mode
from bilinear_tpu.utils.preempt import GracefulShutdown, global_requested
from bilinear_tpu.utils.profiling import trace


def main(argv=None) -> None:
    cfg = parse_config(BilinearConfig(), argv)
    # Multi-host: --coordinator host:port --num-processes N --process-id i on
    # every process. The bins are loaded in full everywhere; the dataset
    # arrays become global 'data'-sharded arrays and the whole-epoch program
    # runs DP over the global mesh (gradient psum over ICI/DCN).
    distributed = mesh_lib.maybe_init_distributed(cfg)
    mesh = mesh_lib.make_mesh() if distributed else None
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
    if mesh is not None:
        x, y = mesh_lib.global_from_host(mesh, (train.part, train.s))
    else:
        x = jnp.asarray(train.part)
        y = jnp.asarray(train.s)

    trainer = BilinearTrainer(
        batch_size=cfg.batch_size,
        mesh=mesh,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
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

    shutdown = GracefulShutdown(logger)
    epochs_done = 0

    def on_epoch_end(epoch: int, st, losses):
        nonlocal epochs_done
        epochs_done += 1
        if primary:
            save_checkpoint(parameter_dir, epoch, st)
            prune_checkpoints(parameter_dir, cfg.keep_checkpoints, cfg.keep_every)
            # Per-step scalars, matching the reference's granularity
            # (train_bilinear.py:86). The loss array is already on host after
            # one fetch; steps for this epoch end at st.step.
            # st.step is post-incremented (starts at 1, n steps -> n+1), so
            # this epoch's losses belong to steps [st.step - len, st.step).
            loss_arr = np.asarray(losses, np.float32)
            first_step = int(st.step) - len(loss_arr)
            for i, loss in enumerate(loss_arr):
                writer.scalar("BI/loss", float(loss), first_step + i)
            logger.info("Epoch %d saved (loss: %f)", epoch, float(loss_arr[-1]))
        # Truthy -> fit stops after this epoch. Multi-host runs agree on
        # the flag first, else un-signaled processes hang in the next
        # epoch's collectives.
        shutdown.log_pending()
        return global_requested(shutdown.requested)

    t0 = time.time()
    profile_ctx = trace(log_dir) if cfg.profile else contextlib.nullcontext()
    nan_ctx = debug_mode() if cfg.debug_nans else contextlib.nullcontext()
    with profile_ctx, nan_ctx, shutdown:
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
    logger.info(
        "%d epochs in %.1fs (%.0f poses/sec)",
        epochs_done,
        dt,
        epochs_done * len(train) / dt,
    )
    if shutdown.requested:
        logger.info("Preempted after epoch %d/%d; checkpoint saved, exiting 0",
                    start_epoch + epochs_done, start_epoch + cfg.epochs_per_run)
    writer.close()


if __name__ == "__main__":
    main()

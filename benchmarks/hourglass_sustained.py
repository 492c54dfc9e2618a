"""Sustained hourglass training throughput INCLUDING the host JPEG pipeline.

Round-1 numbers for the fused train step were device-side only; the
reference's actual bottleneck was per-sample host image work in 8 DataLoader
workers (/root/reference/MPII/data.py:70-140). This benchmark answers the
question round 1 left open: with real-shaped JPEG decode on the host, what
does a training step cost end to end?

Method: generate a synthetic MPII tree with realistic image sizes (720p
JPEGs, the common MPII frame size), then measure three quantities over the
same records:

  host_only   - iterate the MPIIHostPipeline with prefetch disabled and no
                device work: decode + region pack cost per batch.
  device_only - the fused train step on a resident batch, K-differenced
                (utils/profiling rules; scalar-fetch sync — correct under
                either block_until_ready behavior on the tunneled platform).
  sustained   - the real training loop (HourglassTrainer.fit_epoch with the
                prefetching pipeline, grouped dispatch) over >= --batches
                batches, wall-clocked with a final loss fetch.

Prints one JSON line per quantity plus a summary with
sustained/device_only ratio (RESULTS.md target: <= ~1.2x).

Usage (on the TPU):
  python benchmarks/hourglass_sustained.py --batches 200 --dtype bfloat16
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_dataset(root: str, n_images: int, img_size) -> None:
    from bilinear_tpu.data.synthetic import write_mpii_dataset

    marker = os.path.join(root, f".sustained_{n_images}_{img_size[0]}")
    if os.path.exists(marker):
        return
    write_mpii_dataset(
        root, n_train_images=n_images, n_test_images=2, img_size=img_size
    )
    with open(marker, "w") as f:
        f.write("ok")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/bilinear_sustained_mpii")
    p.add_argument("--images", type=int, default=400,
                   help="unique JPEGs (records reshuffle across epochs)")
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--batches", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--transport", default="u8", choices=["u8", "f32"])
    p.add_argument("--group", type=int, default=4,
                   help="batches per device dispatch (steps_per_dispatch)")
    p.add_argument("--decode-threads", type=int, default=8)
    p.add_argument("--canvas", type=int, default=512,
                   help="host canvas size; smaller ships fewer bytes per "
                   "step (big crops fall back to the reference's two-stage "
                   "resample path)")
    p.add_argument("--cache", action="store_true",
                   help="materialize decoded u8 canvases to a memmap "
                   "(one-time decode, epochs then skip JPEG work)")
    p.add_argument("--tiny-model", action="store_true",
                   help="1-stack/8-feature model (CI / CPU smoke)")
    args = p.parse_args(argv)

    from bilinear_tpu.data.h36m import Task
    from bilinear_tpu.data.mpii import MPIIAnnotations
    from bilinear_tpu.data.pipeline import MPIIHostPipeline
    from bilinear_tpu.train.hourglass import HourglassTrainer

    build_dataset(args.root, args.images, (args.height, args.width))
    anns = MPIIAnnotations(args.root, Task.Train, split_seed=0)

    def make_pipe():
        pipe = MPIIHostPipeline(
            anns, args.batch_size, canvas=args.canvas, shuffle=True, seed=0,
            drop_last=True, transport=args.transport,
            cache_dir=os.path.join(args.root, "canvas_cache")
            if args.cache else None,
        )
        pipe.decode_threads = args.decode_threads
        return pipe

    pipe = make_pipe()
    per_epoch = len(pipe)
    n_epochs = -(-args.batches // per_epoch)

    # ---- host_only: decode + pack, no prefetch, no device ------------------
    # Warm one epoch first (page cache for the JPEG files).
    for _ in pipe.epoch(0, prefetch=0):
        pass
    t0 = time.perf_counter()
    n_host = 0
    for e in range(n_epochs):
        for _ in pipe.epoch(e, prefetch=0):
            n_host += 1
    host_s = (time.perf_counter() - t0) / n_host
    print(json.dumps({
        "metric": "hourglass_host_pipeline",
        "ms_per_batch": round(host_s * 1e3, 2),
        "images_per_sec": round(args.batch_size / host_s, 1),
        "batch_size": args.batch_size,
        "image_size": [args.height, args.width],
        "transport": args.transport,
        "decode_threads": args.decode_threads,
        "canvas": args.canvas,
        "cache": args.cache,
    }), flush=True)

    # ---- trainer ------------------------------------------------------------
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    size = dict(n_stacks=1, features=8, depth=1) if args.tiny_model else {}
    trainer = HourglassTrainer(
        batch_size=args.batch_size, dtype=dtype, canvas=args.canvas, **size
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    # ---- device_only: resident batch, K-differenced scan -------------------
    resident = next(iter(pipe.epoch(0, prefetch=0)))
    dev_batch = {
        "images": jnp.asarray(resident.images),
        "centers": jnp.asarray(resident.centers),
        "scales": jnp.asarray(resident.scales),
        "keypoints": jnp.asarray(resident.keypoints),
        "valid": jnp.asarray(resident.valid),
    }

    from bilinear_tpu.utils.profiling import measure_step_fn

    device_s = measure_step_fn(
        trainer._train_step, state, dev_batch, jax.random.PRNGKey(1),
        k1=2, k2=10,
    )
    print(json.dumps({
        "metric": "hourglass_device_step",
        "ms_per_step": round(device_s * 1e3, 2),
        "images_per_sec": round(args.batch_size / device_s, 1),
        "dtype": args.dtype,
    }), flush=True)

    # ---- sustained: the real loop (prefetch + grouped dispatch) -------------
    # Warm the grouped-dispatch program before timing.
    state, _ = trainer.fit_epoch(
        state, pipe, 0, jax.random.PRNGKey(2), group=args.group
    )
    steps = 0
    t0 = time.perf_counter()
    loss = None
    for e in range(1, n_epochs + 1):
        state, loss = trainer.fit_epoch(
            state, pipe, e, jax.random.PRNGKey(2 + e), group=args.group
        )
        steps += per_epoch
        if steps >= args.batches:
            break
    float(loss)  # force everything queued
    sustained_s = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "metric": "hourglass_sustained_train",
        "ms_per_step": round(sustained_s * 1e3, 2),
        "images_per_sec": round(args.batch_size / sustained_s, 1),
        "steps": steps,
        "group": args.group,
        "vs_device_only": round(sustained_s / device_s, 3),
        "host_over_device": round(host_s / device_s, 3),
    }), flush=True)


if __name__ == "__main__":
    main()

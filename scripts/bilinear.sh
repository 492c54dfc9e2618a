#!/usr/bin/env bash
# Outer training driver for the lifting network: alternate 10-epoch train
# blocks with validation, 40 times (the reference's bilinear.sh contract —
# cross-invocation state lives entirely in checkpoints, so a crash loses at
# most one block).
set -e
RUNS="${RUNS:-40}"
for i in $(seq 1 "$RUNS"); do
    python -m bilinear_tpu.cli.train_bilinear "$@"
    python -m bilinear_tpu.cli.valid_bilinear "$@"
done

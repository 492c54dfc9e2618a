#!/usr/bin/env bash
# Outer training driver for the 2D detector: alternate 10-epoch train blocks
# with PCKh validation, 20 times (the reference's hourglass.sh contract).
set -e
RUNS="${RUNS:-20}"
for i in $(seq 1 "$RUNS"); do
    python -m bilinear_tpu.cli.train_hourglass "$@"
    python -m bilinear_tpu.cli.valid_hourglass "$@"
done

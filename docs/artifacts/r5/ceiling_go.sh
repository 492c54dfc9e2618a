#!/bin/bash
# Round-5 VERDICT #6: measure the hardened learnable task's ceiling by
# training the production detector well past the r4 plateau (epochs 1-300,
# same tree seeds/knobs as the r4 x20 budget run: jitter 20, occlusion 0.25,
# 4 decoys, 480-image 720p, canvas 384, batch 8, bf16, RMSprop 2.5e-4).
set -x
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /tmp/r5ceiling
FLAGS="--data-dir /tmp/r5ceiling/data/MPII --save-root /tmp/r5ceiling/save \
  --batch-size 8 --dtype bfloat16 --canvas 384 --transport u8 \
  --cache-canvases true --steps-per-dispatch 6 --epochs-per-run 50 \
  --keep-checkpoints 2"
SECONDS=0
for i in 1 2 3 4 5 6; do
  python -m bilinear_tpu.cli.train_hourglass $FLAGS
  echo "train block $i done t=${SECONDS}s"
  python -m bilinear_tpu.cli.valid_hourglass $FLAGS
  echo "valid $i done t=${SECONDS}s"
done
echo "=== CEILING RUN DONE t=${SECONDS}s ==="

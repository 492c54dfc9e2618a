#!/bin/bash
# Round-4 VERDICT #8: the full SH protocol chain at production size on-chip,
# as real CLI processes (SURVEY.md §3.5) — detector FT -> sh_preprocess over
# train+valid -> SH+FT lifting -> valid_bilinear, vs the same lifting on GT.
set -x
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /tmp/r4chain
H36M=/tmp/r4chain/data/Human3.6M
SAVE=/tmp/r4chain/save
SECONDS=0

echo "=== [0] dataset: generated on CPU (BILINEAR_TPU_PLATFORM=cpu), 13.8s ==="

echo "=== [1] train_hourglass_ft (production preact 8/256/4, bf16) ==="
python -m bilinear_tpu.cli.train_hourglass_ft \
  --data-dir "$H36M" --save-root "$SAVE" \
  --batch-size 8 --dtype bfloat16 --canvas 512 --transport u8 \
  --cache-canvases true --steps-per-dispatch 8 --epochs-per-run 30 \
  --keep-checkpoints 2
echo "t=${SECONDS}s"

echo "=== [2] sh_preprocess train+valid (FT detections -> SH+FT bins) ==="
python -m bilinear_tpu.cli.sh_preprocess \
  --comment "Hourglass FT" --variant preact --save-root "$SAVE" \
  --h36m-dir "$H36M" --protocol-out "SH+FT" \
  --batch-size 16 --canvas 512 --transport u8 --cache-canvases true
echo "t=${SECONDS}s"

echo "=== [3] train_bilinear --protocol SH+FT (200 epochs) ==="
python -m bilinear_tpu.cli.train_bilinear \
  --data-dir "$H36M" --protocol "SH+FT" --comment "Bilinear SH+FT" \
  --save-root "$SAVE" --epochs-per-run 200 --keep-checkpoints 2
echo "t=${SECONDS}s"

echo "=== [4] valid_bilinear SH+FT ==="
python -m bilinear_tpu.cli.valid_bilinear \
  --data-dir "$H36M" --protocol "SH+FT" --comment "Bilinear SH+FT" \
  --save-root "$SAVE"
echo "t=${SECONDS}s"

echo "=== [5] train_bilinear --protocol GT (baseline, 200 epochs) ==="
python -m bilinear_tpu.cli.train_bilinear \
  --data-dir "$H36M" --protocol GT --comment "Bilinear GT" \
  --save-root "$SAVE" --epochs-per-run 200 --keep-checkpoints 2
echo "t=${SECONDS}s"

echo "=== [6] valid_bilinear GT ==="
python -m bilinear_tpu.cli.valid_bilinear \
  --data-dir "$H36M" --protocol GT --comment "Bilinear GT" \
  --save-root "$SAVE"
echo "t=${SECONDS}s"
echo "=== CHAIN DONE ==="

#!/bin/bash
# Multitask pretraining launch (reference scripts/pretrain_streamformer.sh:
# torchrun 8-GPU, bs16/GPU, update_freq 7, 20 epochs, lr 2e-5, 16 frames).
# On TPU a single-controller process drives the whole mesh — no torchrun;
# DP/TP come from jax.sharding (see streamformer_tpu/parallel/sharding.py).
set -e
OUTPUT_DIR=${OUTPUT_DIR:-output/pretrain_streamformer}
METADATA=${METADATA:-scripts/dataset_metadata/all.yaml}

python -m streamformer_tpu.train.run \
  --metadata "$METADATA" \
  --output_dir "$OUTPUT_DIR" \
  --batch_size 16 \
  --update_freq 7 \
  --epochs 20 \
  --lr 2e-5 \
  --warmup_epochs 1 \
  --weight_decay 0.05 \
  --num_frames 16 \
  --input_size 224 \
  --num_workers 16 \
  --bf16 \
  "$@"

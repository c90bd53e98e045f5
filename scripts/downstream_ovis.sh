#!/bin/bash
# OVIS segmentor training (reference downstream/OVIS/train_ctvis.py with
# configs/ytvis_2019/CTVIS_Streamformer.yaml: 100 queries, lr 1e-4,
# frozen backbone + ViT-Adapter FPN).
set -e
OUTPUT_DIR=${OUTPUT_DIR:-output/ovis_ytvis19}
python -m streamformer_tpu.downstream.ovis_run \
  --anno "${ANNO:?set ANNO}" \
  --video_root "${VIDEO_ROOT:-}" \
  --num_classes "${NUM_CLASSES:-40}" \
  --model_path "${MODEL_PATH:-}" \
  --output_dir "$OUTPUT_DIR" \
  --num_queries 100 --epochs 12 --lr 1e-4 --num_frames 2 \
  "$@"

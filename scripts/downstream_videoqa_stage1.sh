#!/bin/bash
# VideoQA stage 1 (reference downstream/VideoQA/scripts/train/stage1*.sh:
# stage 1 = projector pretrain, stage 2 = image-QA SFT, stage 3 = video-QA
# SFT with the vision tower trainable at lr 2e-6).
set -e
OUTPUT_DIR=${OUTPUT_DIR:-output/videoqa_stage1}
python -m streamformer_tpu.downstream.videoqa_run \
  --data "${DATA:?set DATA}" \
  --video_root "${VIDEO_ROOT:-}" \
  --stage 1 \
  --model_path "${MODEL_PATH:-}" \
  --lm_path "${LM_PATH:-}" \
  --tokenizer "${TOKENIZER:-}" \
  --output_dir "$OUTPUT_DIR" \
  --num_frames 16 --input_size 224 --max_len 2048 \
  "$@"

#!/bin/bash
# AR finetune (reference downstream/AR/exp/k400/*.sh: bs16, num_sample 2,
# lr 2e-4, 30 epochs, LoRA-spatial, multi-view test 4 segments x 3 crops).
set -e
OUTPUT_DIR=${OUTPUT_DIR:-output/ar_k400}
python -m streamformer_tpu.downstream.ar_run \
  --anno_train "${ANNO_TRAIN:?set ANNO_TRAIN}" \
  --anno_val "${ANNO_VAL:-}" \
  --anno_test "${ANNO_TEST:-}" \
  --prefix "${VIDEO_ROOT:-}" \
  --num_classes "${NUM_CLASSES:-400}" \
  --model_path "${MODEL_PATH:-}" \
  --output_dir "$OUTPUT_DIR" \
  --batch_size 16 --epochs 30 --lr 2e-4 --warmup_epochs 2 \
  --num_frames 16 --input_size 224 \
  --mixup 0.8 --cutmix 1.0 --smoothing 0.1 \
  --add_lora_spatial --bf16 \
  --test_num_segment 4 --test_num_crop 3 \
  "$@"

#!/bin/bash
# OAD LSTR/MAT on extracted features (reference
# downstream/OAD/configs/THUMOS/MAT/streamformer_multitask_without_flow.yaml:
# long memory 256s @ stride 4 = 512 samples, work memory 32, lr 7e-5).
# Features come from scripts/downstream_extract_oad_feature.sh.
set -e
OUTPUT_DIR=${OUTPUT_DIR:-output/oad_thumos}
python -m streamformer_tpu.downstream.oad_run \
  --feature_root "${FEATURE_ROOT:?set FEATURE_ROOT}" \
  --target_root "${TARGET_ROOT:?set TARGET_ROOT}" \
  --train_list "${TRAIN_LIST:?set TRAIN_LIST}" \
  --val_list "${VAL_LIST:-}" \
  --num_classes "${NUM_CLASSES:-22}" \
  --output_dir "$OUTPUT_DIR" \
  --batch_size 16 --epochs 25 --lr 7e-5 --weight_decay 5e-5 \
  --long_memory_num_samples 512 --work_memory_num_samples 32 \
  --long_sample_rate 4 \
  "$@"

#!/bin/bash
# Long-video OAD feature extraction (reference
# scripts/downstream_extract_oad_feature.sh: 8-way fractional video-list
# sharding). Shard with START_FRAC/END_FRAC across hosts; SLOTS videos
# stream concurrently through one ragged (per-stream length) cache on each
# chip (continuous batching — extract.oad.extract_videos_batched).
set -e
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to an HF checkpoint dir}
VIDEO_LIST=${VIDEO_LIST:?file with one video path per line}
OUT_DIR=${OUT_DIR:-oad_features}
START_FRAC=${START_FRAC:-0}
END_FRAC=${END_FRAC:-1}
SLOTS=${SLOTS:-8}

python - <<PYEOF
import os
from streamformer_tpu.checkpoint import from_pretrained
from streamformer_tpu.extract import oad

cfg, params = from_pretrained("$MODEL_PATH")
cfg = cfg.replace(dtype="bfloat16")
videos = [l.strip() for l in open("$VIDEO_LIST") if l.strip()]
lo = int(len(videos) * float("$START_FRAC"))
hi = int(len(videos) * float("$END_FRAC"))
todo = [
    v for v in videos[lo:hi]
    if not os.path.exists(os.path.join(
        "$OUT_DIR", os.path.splitext(os.path.basename(v))[0] + ".npy"))
]
feats = oad.extract_videos_batched(
    params, cfg, todo, out_dir="$OUT_DIR", slots=int("$SLOTS")
)
for v, f in zip(todo, feats):
    print(os.path.basename(v), f.shape)
PYEOF

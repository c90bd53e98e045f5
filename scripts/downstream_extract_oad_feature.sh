#!/bin/bash
# Long-video OAD feature extraction (reference
# scripts/downstream_extract_oad_feature.sh: 8-way fractional video-list
# sharding). Shard with START_FRAC/END_FRAC across hosts.
set -e
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to an HF checkpoint dir}
VIDEO_LIST=${VIDEO_LIST:?file with one video path per line}
OUT_DIR=${OUT_DIR:-oad_features}
START_FRAC=${START_FRAC:-0}
END_FRAC=${END_FRAC:-1}

python - <<PYEOF
import os
import numpy as np
import jax
from streamformer_tpu.checkpoint import from_pretrained
from streamformer_tpu.extract import oad

cfg, params = from_pretrained("$MODEL_PATH")
cfg = cfg.replace(dtype="bfloat16")
videos = [l.strip() for l in open("$VIDEO_LIST") if l.strip()]
lo = int(len(videos) * float("$START_FRAC"))
hi = int(len(videos) * float("$END_FRAC"))
for v in videos[lo:hi]:
    name = os.path.splitext(os.path.basename(v))[0]
    out = os.path.join("$OUT_DIR", name + ".npy")
    if os.path.exists(out):
        continue
    feats = oad.extract_video(params, cfg, v, out_path=out, mode="streaming")
    print(name, feats.shape)
PYEOF
